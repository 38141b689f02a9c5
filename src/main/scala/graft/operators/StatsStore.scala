package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained corpus statistics — the
  * materialized-view-maintenance discipline for the numbers every
  * curation dashboard reads (per-language doc/token/char counts):
  * at 100 TB, recomputing corpus stats per ingest wave means a full
  * corpus scan per wave, but the aggregates are ADDITIVE (a
  * commutative group), so the store needs only the WAVE's stats
  * merged in — and deletions retract exactly by adding the removed
  * docs' stats with sign −1 (the tombstone idea applied to an
  * aggregate instead of an index). Invariant (spec- and
  * oracle-gated): after any sequence of add/retract waves the store
  * equals a full recompute over the surviving docs.
  *
  * Store shape: one parquet table keyed by `key` with exact LONG
  * counters; waves rewrite it via the appendIndex staged-rename
  * discipline (write `store_new`, rename out, rename in) so a reader
  * never sees a half-merged table. Contract: a retraction must cover
  * docs previously added (exact multiset retraction — the caller's
  * tombstones); retracting unknown docs corrupts the counters,
  * exactly like decrementing a df you never incremented.
  *
  * Reference scope note: the reference bundle (CreateHQL.scala)
  * keeps no state at all; this is the LLM-pipeline extension's
  * ingest-bookkeeping surface (d62's store lifecycle, applied to
  * aggregates).
  */
object StatsStore {

  /** Per-key wave stats with the given sign: `(key, n_docs,
    * n_tokens, n_chars)` — whitespace tokens, non-space chars. */
  private def statsOf(docs: DataFrame, keyCol: String,
                      textCol: String, sign: Int): DataFrame =
    docs.groupBy(col(keyCol).as("key")).agg(
      (count(lit(1)) * sign).cast("long").as("n_docs"),
      (sum(size(filter(split(col(textCol), " "),
        w => length(w) > 0))) * sign).cast("long").as("n_tokens"),
      (sum(length(regexp_replace(col(textCol), " ", ""))) * sign)
        .cast("long").as("n_chars"))

  /** Bootstrap the store from the first wave. */
  def init(docs: DataFrame, keyCol: String, textCol: String,
           dir: String): Unit =
    statsOf(docs, keyCol, textCol, 1)
      .write.mode("overwrite").parquet(s"$dir/store")

  /** Merge one wave in: `retract = false` adds the wave's stats,
    * `retract = true` subtracts them (over the whole wave SEQUENCE
    * the retractions must cover docs that were added — but order is
    * free: the group is commutative, so a retraction may arrive
    * before its adds and the intermediates simply hold negative
    * counters until they cancel). Only the true identity element
    * (ALL counters zero — a fully-retracted key) leaves the store;
    * dropping on `n_docs = 0` alone would corrupt an out-of-order
    * intermediate where doc counts cancel while token counts have
    * not. The store is read from DISK and the merged table swaps in
    * by staged rename, so the wave's own lineage never dangles into
    * the store it replaces. */
  def applyWave(docs: DataFrame, keyCol: String, textCol: String,
                dir: String, retract: Boolean = false): Unit = {
    val spark = docs.sparkSession
    spark.read.parquet(s"$dir/store")
      .unionByName(statsOf(docs, keyCol, textCol,
        if (retract) -1 else 1))
      .groupBy("key").agg(
        sum("n_docs").cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum("n_chars").cast("long").as("n_chars"))
      .filter(col("n_docs") =!= 0 || col("n_tokens") =!= 0 ||
        col("n_chars") =!= 0)
      .write.mode("overwrite").parquet(s"$dir/store_new")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(s"$dir/store_retired"), true)
    require(fs.rename(p(s"$dir/store"), p(s"$dir/store_retired")),
      "StatsStore.applyWave: rename-out of the store failed")
    require(fs.rename(p(s"$dir/store_new"), p(s"$dir/store")),
      "StatsStore.applyWave: rename-in of the merged store failed")
  }

  def read(spark: org.apache.spark.sql.SparkSession,
           dir: String): DataFrame =
    spark.read.parquet(s"$dir/store")
}
