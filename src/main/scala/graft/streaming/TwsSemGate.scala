package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming SEMANTIC near-dup ingest gate — the streaming arm of
  * d36's SemDeDup (Abbas et al. 2023), the way [[TwsLshGate]] is the
  * streaming arm of the banded-LSH batch path: vectors arrive as a
  * stream, each is routed to its sign-LSH cell, and a TTL'd
  * `ListState[Array[Double]]` per cell holds the vectors ADMITTED so
  * far. An arrival is admitted iff no stored cell-mate reaches the
  * cosine threshold; only admitted vectors enter the state — the
  * online greedy, which is the only semantics an ingest gate can
  * have (it cannot retract a vector it already let through).
  *
  * Scale story — the state bound is GEOMETRIC, not temporal: admitted
  * vectors within a cell are pairwise below the threshold, so each
  * cell's list is a θ-packing of its sphere sector — its size is
  * bounded by the packing number (a function of θ and the dimension
  * alone), never by how many vectors streamed past. TTL is belt and
  * braces on top (domain drift), same eviction contract as the other
  * TwS gates. Per-arrival cost is one scan of that bounded list.
  *
  * Intra-batch rows are processed in vec_id order so a micro-batch's
  * decisions are canonical regardless of shuffle order; cross-batch
  * the admitted set is first-writer-wins, exactly like [[TwsLshGate]]
  * (w24's single-batch assert / w26's multi-batch oracle discipline
  * applies — w31 asserts the single-batch shape it gates). */
object TwsSemGate {

  private class Proc(theta: Double, ttl: java.time.Duration)
      extends StatefulProcessor[String, (String, Long, Array[Double]),
        (Long, Boolean)] {
    @transient private var admitted: ListState[Array[Double]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getListState[Array[Double]](
        "admittedVecs", ExpressionEncoder[Array[Double]](),
        new TTLConfig(ttl))

    // left-to-right single-pass fold — the same IEEE add order as the
    // DuckDB oracle's list_reduce, so cosines match bit-for-bit
    private def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Array[Double])],
        timerValues: TimerValues): Iterator[(Long, Boolean)] = {
      val out = Vector.newBuilder[(Long, Boolean)]
      rows.toArray.sortBy(_._2).foreach { case (_, id, v) =>
        val hit = admitted.get().exists(u => cos(u, v) >= theta)
        if (!hit) admitted.appendValue(v)
        out += ((id, !hit))
      }
      out.result().iterator
    }
  }

  /** `(bucket, vec_id, vec)` rows → `(vec_id, admitted)`. Requires the
    * RocksDB state store provider and `TimeMode.ProcessingTime` (TTL). */
  def perCell(vecs: Dataset[(String, Long, Array[Double])],
              theta: Double = 0.35,
              ttl: java.time.Duration = java.time.Duration.ofMinutes(10))
      : Dataset[(Long, Boolean)] = {
    implicit val enc: Encoder[(Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaBoolean)
    vecs.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new Proc(theta, ttl), TimeMode.ProcessingTime(),
        OutputMode.Update())
  }
}
