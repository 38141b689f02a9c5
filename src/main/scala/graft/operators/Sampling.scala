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

  /** Weighted sampling WITHOUT replacement by the Efraimidis–Spirakis
    * exponential-keys method (IPL 2006) — the one-pass, coordination-
    * free way to draw k docs with probability proportional to weight
    * at any scale: each row gets key `u^(1/w)` for a uniform u, and
    * the global top-k keys ARE the sample. Here u is the row's
    * 60-bit content hash mapped to (0,1] — no RNG state, identical
    * across runs/partitionings/engines — and the rank uses the
    * order-equivalent `ln(u)/w` (monotone in u^(1/w); avoids
    * underflow for large weights). The top-k is a TakeOrdered — a
    * per-partition k-heap + driver merge, never a global sort.
    * `es_key` rounds to 9 decimals BEFORE ranking so the cross-
    * engine ordering is over identical values (ties break on id). */
  def weightedTopK(df: DataFrame, idCol: String, w: Column,
                   uSrc: Column, k: Int): DataFrame = {
    val h = Dedup.hash60(uSrc) % Dedup.HashP
    val u = (h + lit(1L)).cast("double") /
      lit((Dedup.HashP + 1L).toDouble)
    // weight gate BEFORE the key projection: ANSI division reports
    // a zero divisor instead of yielding the -inf key that would
    // harmlessly sort last
    df.filter(w.cast("long") > 0)
      .select(col(idCol), w.cast("long").as("w"),
        round(log(u) / w.cast("double"), 9).as("es_key"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
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
