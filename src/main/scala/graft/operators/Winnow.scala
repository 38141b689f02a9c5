package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-gram, slide a
  * w-wide window over the hash sequence and keep each window's MINIMUM
  * — the selected set is a position-robust fingerprint with a
  * guaranteed density (≥ 1 selection per window, so any match of
  * length ≥ w+k−1 is caught) at ~2/(w+1) of the grams. The
  * local-min selection is what d10's fixed-stride rolling fingerprint
  * lacks: winnowing's choices survive insertions/deletions elsewhere
  * in the document.
  *
  * Scale shape: gram hashing reuses [[SpanDedup.gramOccurrences]]
  * (one explode, 8-byte hashes); the window min is ONE analytic
  * window per doc ordered by position (`ROWS BETWEEN CURRENT ROW AND
  * w-1 FOLLOWING`) — a doc-partitioned sort, no self-join; the
  * distinct selected hashes per doc are the fingerprint set, and the
  * cross-doc candidate pairs meet in one shuffle on the fingerprint
  * hash with the d52-style frequency cap available upstream (a
  * boilerplate fingerprint shared by everything would otherwise fan
  * out quadratically).
  */
object Winnow {

  /** Gram occurrences with an md5-derived 60-bit hash (the d17
    * discipline): winnowing's SELECTION depends on hash VALUES, not
    * just equality, so the gate needs a hash both engines compute
    * identically — `xxhash64` ([[SpanDedup.gramOccurrences]]) has no
    * DuckDB twin. Production would use the xxhash64 variant; the
    * selection logic is hash-agnostic. */
  def gramOccurrencesMd5(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), i -> struct(i AS pos, " +
          s"cast(conv(substring(md5(array_join(slice(t, i + 1, $n), ' ')), " +
          s"1, 15), 16, 10) AS BIGINT) AS gh))")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.gh").as("gh"))

  /** Per-doc winnowing fingerprints `(doc_id, fp)` — distinct window
    * minima of the k-gram hash sequence. `occ` is
    * [[SpanDedup.gramOccurrences]] output. */
  def fingerprints(occ: DataFrame, w: Int): DataFrame =
    occ
      .withColumn("wmin", min("gh").over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1)))
      // positions past len-w have truncated windows; dropping them
      // keeps exactly the len-w+1 full windows of the paper
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n") - w)
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()

  /** Candidate near-dup pairs: docs sharing ≥ `minShared` fingerprints,
    * with the shared count — MOSS's report ranking. One shuffle on
    * `fp`; `maxFpDf` drops fingerprints shared by more than that many
    * docs (corpus boilerplate — the d52 df-cap discipline: a
    * universal fingerprint adds no evidence and fans out
    * quadratically). */
  def sharedFingerprintPairs(fps: DataFrame, minShared: Long,
                             maxFpDf: Long): DataFrame = {
    val capped = fps
      .withColumn("fdf", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("fdf") <= maxFpDf)
    capped.select(col("doc_id").as("doc_a"), col("fp"))
      .join(capped.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
