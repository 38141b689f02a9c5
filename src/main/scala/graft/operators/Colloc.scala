package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining via pointwise mutual information — surfacing
  * multi-word expressions ("new york", "machine learning") a tokenizer
  * or phrase-aware dedup should treat as units (Church & Hanks 1990).
  *
  * Scale shape: bigram counting is one explode (2 rows per token,
  * adjacent pairs) + one hash aggregation on the combined key; unigram
  * counts are a second explode+agg; the PMI join keys on the Zipf-
  * skewed word columns (AQE skew handling applies; the vocabulary-
  * sized count tables are NOT assumed broadcastable at corpus scale);
  * the corpus totals are 1-row aggregates OF the count tables (so the
  * denominators can never disagree with the numerators on tokenization
  * edge cases). Top-k is a bounded sort over the min-count-filtered
  * survivors.
  *
  * Determinism: PMI = round(ln((c_ab·NT·NT)/(NB·c_a·c_b)), 6) with the
  * operands cast to double BEFORE the arithmetic and the same
  * left-associative expression on both engines; the 6-decimal round
  * absorbs libm ulp differences (the tfidf discipline).
  */
object Colloc {

  /** Adjacent-bigram counts `(w1, w2, c_ab)` — one explode over
    * `transform(sequence(...))`, one hash agg. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(TextAnalysis.tokens(col(textCol)).as("t"))
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"))
        .as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))

  /** Unigram counts `(w, c_w)`. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c_w"))

  /** Top-`k` collocations by PMI among bigrams with `c_ab >= minCount`:
    * `(w1, w2, c_ab, pmi)`, ordered (pmi DESC, w1, w2). */
  def pmiTopK(bigrams: DataFrame, unigrams: DataFrame,
              minCount: Long, k: Int): DataFrame = {
    val totals = bigrams.agg(sum("c_ab").cast("long").as("nb"))
      .crossJoin(unigrams.agg(sum("c_w").cast("long").as("nt")))
    bigrams
      .filter(col("c_ab") >= minCount)
      .join(unigrams.withColumnRenamed("w", "w1")
        .withColumnRenamed("c_w", "c_a"), "w1")
      .join(unigrams.withColumnRenamed("w", "w2")
        .withColumnRenamed("c_w", "c_b"), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("c_ab").cast("double") * col("nt") * col("nt")) /
          (col("nb").cast("double") * col("c_a") * col("c_b"))), 6))
      .select("w1", "w2", "c_ab", "pmi")
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
