package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming NEAR-dup ingest gate (VERDICT r07 #4) — the streaming arm
  * of the banded-LSH batch path (`Dedup.minhashBands` →
  * `candidatePairs`): documents arrive as a stream, each contributes
  * one row per MinHash band, and the state is keyed by the BAND BUCKET
  * `(band index, signature)`. A TTL'd `ValueState[Long]` holds the
  * bucket's owner — the first (minimum) doc id registered — and every
  * later arrival in the bucket is flagged as a near-dup hit. A document
  * is admitted iff NO band bucket reports a smaller owner (the per-doc
  * `max(hit)` fold downstream).
  *
  * Scale story: state is one long per OCCUPIED band bucket — bounded by
  * the distinct-bucket count inside the TTL horizon, never by documents
  * seen (the same eviction contract as [[TwsTtl]]; RocksDB TTL column
  * family does the aging).
  *
  * Cross-batch semantics are FIRST-WRITER-WINS, deliberately: the gate
  * decides admission online, and an ingest gate cannot retract a doc it
  * already admitted in an earlier micro-batch — so when a SMALLER id
  * arrives after a larger one already owns a shared bucket, the
  * later-arriving smaller id is the one rejected. Within one
  * micro-batch, rows in a bucket are sorted before the owner check, so
  * intra-batch ties are canonical (smallest id) regardless of shuffle
  * order. Two oracles pin both regimes (ADVICE r08 / VERDICT r08 #1):
  * w24 checks the single-batch shape (where first-writer-wins equals
  * the batch LSH self-join "smaller id shares a bucket" predicate, and
  * the query ASSERTS the one-data-batch assumption it relies on), and
  * w26 splits arrival across ≥3 micro-batches in non-id order and
  * checks the true predicate: rejected iff a shared bucket has an
  * EARLIER-ARRIVING registrant (earlier wave, or same wave and smaller
  * id). TTL expiry re-seeds ownership — the first arrival after the
  * owner ages out is admitted and becomes the new owner
  * (StreamingSpec "re-admits after the owner ages out").
  */
object TwsLshGate {

  private class Proc(ttl: java.time.Duration)
      extends StatefulProcessor[(Int, Long), (Int, Long, Long), (Long, Boolean)] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long](
        "bucketOwner", Encoders.scalaLong, new TTLConfig(ttl))

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[(Int, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Boolean)] = {
      val ds = rows.map(_._3).toArray.sorted
      val own =
        if (owner.exists()) owner.get()
        else { owner.update(ds.head); ds.head }
      ds.iterator.map(d => (d, d != own))
    }
  }

  /** `(band, signature, doc_id)` rows → `(doc_id, hit)` per band row;
    * `hit` = some earlier doc owns this bucket. Requires the RocksDB
    * state store provider and `TimeMode.ProcessingTime` (TTL). */
  def perBucket(bands: Dataset[(Int, Long, Long)],
                ttl: java.time.Duration = java.time.Duration.ofMinutes(10))
      : Dataset[(Long, Boolean)] = {
    implicit val enc: Encoder[(Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaBoolean)
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r._1, r._2))
      .transformWithState(new Proc(ttl), TimeMode.ProcessingTime(),
        OutputMode.Update())
  }
}
