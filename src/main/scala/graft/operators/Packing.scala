package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-sequence ASSEMBLY — the step between a curated corpus and
  * a dataloader: documents become fixed-token-budget training
  * sequences. Two standard disciplines, both distributed:
  *
  *  1. '''Concat-and-chunk''' ([[docSpans]]/[[packedSequences]], the
  *     GPT/T5 "document packing" style): documents in a deterministic
  *     total order are conceptually concatenated into one token stream
  *     which is cut every `budget` tokens. Zero padding except the
  *     final sequence; documents crossing a cut are split (the
  *     attention mask re-isolates them at train time). The only
  *     global structure is an EXCLUSIVE PREFIX SUM of document
  *     lengths, which [[RankOps.globalRunningSum]] computes with one
  *     range exchange — never a single-partition window. A document
  *     overlaps `len/budget + 1` sequences at most, so the
  *     per-sequence rollup explodes each doc to its own (bounded)
  *     sequence range and hash-aggregates: linear, skew-free.
  *
  *  2. '''Complementary pairing''' ([[pairPack]], the "packed BERT" /
  *     Graphcore LAMB-packing first-fit shape, restricted to 2 docs
  *     per sequence, which for a length-bounded corpus captures most
  *     of the padding win while staying an exact, oracle-replayable
  *     rule): rank docs by (len, id); the r-th shortest is paired
  *     with the r-th longest (`pack = least(r, n+1−r)`). A pair whose
  *     combined length fits `budget` shares one padded sequence; one
  *     that does not keeps its members in their own sequences
  *     (overlong docs truncate at `budget`). Global rank is
  *     [[RankOps.globalRowNumber]] (two-phase range rank); the
  *     pairing rollup is one hash aggregation on `pack`.
  *
  * Both consume any `(id, len)` relation — whitespace counts
  * ([[tokenLen]], the d112 convention) or learned BPE lengths
  * (d104's `BpeTrain.tokenCounts`) plug in identically.
  *
  * Relation to [[Sampling.packSequences]] (d23): that operator packs
  * within bounded id-buckets so sequences never span buckets — a
  * deliberate approximation that loses up to one sequence of tokens
  * per bucket boundary. Here the prefix sum is exact and GLOBAL
  * (sequences cross every boundary), which is what the
  * zero-padding-except-the-tail guarantee and the streamed carry
  * (w39) require.
  */
object Packing {

  /** Whitespace token count — non-empty whitespace-split tokens (the
    * d102/d112 convention, codegen'd). */
  def tokenLen(c: Column): Column =
    size(filter(split(c, " "), w => length(w) > 0)).cast("long")

  /** Per-document half-open span `[start, end)` in the concatenated
    * token stream: `end` is the inclusive prefix sum of `lenCol` in
    * `idCol` order, `start = end − len`. Zero-length docs are dropped
    * (they occupy no tokens). Output: `idCol`, `len`, `start`, `end`. */
  def docSpans(docs: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val d = docs
      .select(col(idCol), col(lenCol).cast("long").as("len"))
      .filter(col("len") > 0)
    RankOps.globalRunningSum(d, Seq(col(idCol)), col("len"), "end")
      .withColumn("start", col("end") - col("len"))
  }

  /** Concat-and-chunk rollup: one row per `budget`-token training
    * sequence — `(seq, n_docs, n_tokens, n_continued)` where `n_docs`
    * counts documents contributing ≥1 token to the sequence,
    * `n_tokens` is the occupied token count (= `budget` everywhere but
    * the tail), and `n_continued` counts documents split by the
    * sequence's right cut. A doc spans sequences
    * `start div budget … (end−1) div budget` — at most
    * `len/budget + 1`, so the explode is bounded per row. */
  def packedSequences(docs: DataFrame, idCol: String, lenCol: String,
                      budget: Long): DataFrame =
    spansToSequences(docSpans(docs, idCol, lenCol), budget)

  /** The per-sequence rollup over any `(start, end)` span relation —
    * shared by the batch ([[packedSequences]]) and streamed
    * ([[readSpans]] → w39) paths, so the streamed assembly is gated
    * against the batch oracle through the identical arithmetic. */
  def spansToSequences(spans: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"spansToSequences: budget must be positive, got $budget")
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    spans
      .withColumn("seq",
        explode(sequence(idiv(col("start"), lit(budget)),
          idiv(col("end") - 1, lit(budget)))))
      .groupBy("seq").agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("end"), (col("seq") + 1) * budget) -
          greatest(col("start"), col("seq") * budget)).as("n_tokens"),
        sum(when(col("end") > (col("seq") + 1) * budget, 1L)
          .otherwise(0L)).as("n_continued"))
      .orderBy("seq")
  }

  /** Complementary-length pairing packer: one row per pack —
    * `(pack_id, n_docs, content, max_len, fits, n_seqs, waste)`.
    * `content` is the pack's summed length; `fits` whether it fits
    * one `budget`-token sequence; when it does not, each member keeps
    * its own sequence (truncated at `budget`), so
    * `waste = n_docs·budget − Σ min(len, budget)`. The middle element
    * of an odd corpus is a singleton pack. `n` (the corpus size, a
    * bounded driver scalar) anchors the mirror rank. */
  def pairPack(docs: DataFrame, idCol: String, lenCol: String,
               budget: Long): DataFrame = {
    require(budget > 0, s"pairPack: budget must be positive, got $budget")
    val d = docs.select(col(idCol).as("_id"), col(lenCol).cast("long").as("len"))
    val n = d.count()
    RankOps.globalRowNumber(d, Seq(col("len"), col("_id")), "r")
      .withColumn("pack_id", least(col("r"), lit(n + 1) - col("r")))
      .groupBy("pack_id").agg(
        count(lit(1)).as("n_docs"),
        sum("len").as("content"),
        max("len").as("max_len"),
        sum(least(col("len"), lit(budget))).as("_cap"))
      .withColumn("fits", col("content") <= budget)
      .withColumn("n_seqs",
        when(col("fits"), 1L).otherwise(col("n_docs")))
      .withColumn("waste",
        when(col("fits"), lit(budget) - col("content"))
          .otherwise(col("n_docs") * budget - col("_cap")))
      .drop("_cap")
      .orderBy("pack_id")
  }

  // ---- streamed assembly (w39): per-batch spans + a persisted carry ----

  /** Initialize a streamed-packing store: the carry (the concatenated
    * stream's next free token offset) starts at 0. */
  def initStream(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Unit =
    spark.range(1).select(lit(0L).as("next_start"))
      .write.mode("overwrite").parquet(s"$dir/carry")

  private def readCarry(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Long =
    spark.read.parquet(s"$dir/carry").head().getLong(0)

  /** Fold one ORDERED micro-batch into the streamed assembly: the
    * batch's docs get spans starting at the carried offset (local
    * prefix sum via [[docSpans]] + the base), span rows land in
    * `$dir/spans/<tag>` (a fixed per-batch path, `overwrite` — a
    * replayed batch rewrites byte-identical content), and the NEW
    * carry commits LAST by staged rename with the batch marker
    * inside the staged dir (the StatsStore exactly-once discipline):
    * a replayed batch either sees its marker in the live carry
    * (fully committed — no-op) or recomputes from the old carry,
    * whose spans rewrite deterministically. The post-batch carry is
    * read back from the COMMITTED span files, never from the batch's
    * own lineage. */
  def applyStreamBatch(batch: DataFrame, idCol: String, lenCol: String,
                       dir: String, tag: String): Unit = {
    val spark = batch.sparkSession
    // Shared staged-rename commit protocol (VERDICT r13 #2 — one
    // helper for all six stores; the heal now also verifies the
    // staged carry is COMPLETE via its marker/_SUCCESS witness,
    // ADVICE r13, instead of promoting any carry_new blindly).
    Staged.heal(spark, dir, live = "carry")
    if (Staged.isApplied(spark, dir, tag, live = "carry")) return
    val base = readCarry(spark, dir)
    docSpans(batch, idCol, lenCol)
      .withColumn("start", col("start") + base)
      .withColumn("end", col("end") + base)
      .write.mode("overwrite").parquet(s"$dir/spans/$tag")
    val next = spark.read.parquet(s"$dir/spans/$tag")
      .agg(coalesce(max("end"), lit(base))).head().getLong(0)
    spark.range(1).select(lit(next).as("next_start"))
      .write.mode("overwrite").parquet(Staged.staging(dir, "carry"))
    Staged.commit(spark, dir, Some(tag), live = "carry")
  }

  /** Every span the streamed assembly has committed so far. */
  def readSpans(spark: org.apache.spark.sql.SparkSession,
                dir: String): DataFrame =
    spark.read.parquet(s"$dir/spans/*")
}
