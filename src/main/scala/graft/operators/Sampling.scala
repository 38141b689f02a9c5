package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction sampling: deterministic mixture weighting and
  * token-budget sequence packing — the last mile between a cleaned
  * corpus and actual training batches.
  *
  * Everything is hash- or prefix-sum-based: no RNG state, so results
  * are identical across runs, partitionings, and engines (the DuckDB
  * oracle replays the same integer math), and resampling a grown corpus
  * keeps previous decisions stable (a doc's keep/drop never depends on
  * other rows).
  */
object Sampling {

  /** Permille bucket [0,1000) of a value's md5 — delegates to the one
    * canonical hash-bucket recipe (three oracle SQL strings mirror it;
    * a drifted copy would silently break hash-matching). */
  def hashPermille(c: Column): Column = TextAnalysis.hashBucket(c, 1000)

  /** Mixture sampling: keep a row iff its content-hash permille falls
    * under its group's rate. `rates` (group → permille) is tiny and
    * broadcast; rows in unlisted groups are dropped. At 100 TB this is
    * a scan + broadcast-join + filter — no shuffle of the corpus. */
  def mixtureSample(df: DataFrame, groupCol: String, hashCol: String,
                    rates: Seq[(String, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toDF(groupCol, "permille")
    df.join(broadcast(rdf), groupCol)
      .filter(hashPermille(col(hashCol)) < col("permille"))
      .drop("permille")
  }

  /** Greedy-by-position sequence packing: in id order, each document
    * starts at the running token offset and lands in sequence
    * `start div budget`. Documents are packed within `bucketSize`-id
    * blocks so the prefix-sum window is partitioned and bounded —
    * sequences never span buckets, every bucket packs in parallel, and
    * no single-partition global sort exists at any scale. Adds
    * `bucket`, `start_tok`, `seq_id`. */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
                    budget: Int, bucketSize: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", call_function("div", col(idCol), lit(bucketSize.toLong)))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", call_function("div", col("start_tok"), lit(budget.toLong)))
  }
}
