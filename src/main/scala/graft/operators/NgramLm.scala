package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring with STUPID BACKOFF
  * (Brants, Popat, Xu, Och & Dean, EMNLP 2007 — "Large Language
  * Models in Machine Translation", the distributed web-scale LM
  * recipe) — the perplexity-filter signal of the CCNet/KenLM
  * pipeline family, count-native so it distributes as plain
  * aggregations and joins instead of a trained model artifact.
  *
  * Score of token w_i given context:
  *   - i = 0 (no context):           ln( cu(w_i) / N )
  *   - bigram (w_{i-1}, w_i) seen:   ln( cb / cu(w_{i-1}) )
  *   - else (backoff):               ln( α · cu(w_i) / N )
  * with α = 0.4 (the paper's constant). Not a normalized probability
  * (Stupid Backoff's defining simplification — scores, not probs),
  * which is exactly why it needs no discount estimation pass and
  * scales to web counts.
  *
  * Scale shape: ONE corpus pass builds positions; unigrams and
  * bigrams are hash aggregations over it; scoring joins positions
  * against the two count tables on their natural keys (broadcast
  * when the vocabulary is small, shuffle joins on (prev, w) at web
  * scale — declarative either way) and folds per doc. Cross-engine
  * determinism: per-token ln rounds to 9 decimals and sums as
  * DECIMAL (the BM25 discipline), mean rounds to 6.
  */
object NgramLm {

  /** Per-document mean Stupid-Backoff log-score over the corpus's own
    * counts: `(doc_id, n_tokens, avg_logp)` — the CCNet-style quality
    * signal (low avg_logp = improbable text under the corpus LM:
    * gibberish, boilerplate soup, wrong-language contamination). */
  def docScores(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.4,
                tok: Column => Column = TextAnalysis.tokens): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tok(col(textCol))).as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
      // consumed four times (unigrams, totals, both sides of the
      // shifted self-join, final scoring): checkpoint so the corpus
      // posexplode runs once (the Dsir discipline)
      .localCheckpoint()
    val uni = pos.groupBy("w").agg(count(lit(1)).as("cu"))
    val total = pos.agg(count(lit(1)).cast("long").as("n_total"))
    // (doc, i, prev) for i >= 1: the shifted self-join — equi keys,
    // both sides derived from the same scan
    val prevs = pos.select(col("doc_id"), (col("i") + 1).as("i"),
      col("w").as("prev"))
    val bigrams = prevs.join(pos, Seq("doc_id", "i"))
      .groupBy("prev", "w").agg(count(lit(1)).as("cb"))
    val scored = pos
      .join(prevs, Seq("doc_id", "i"), "left")
      .join(uni, Seq("w"))
      .join(uni.select(col("w").as("prev"), col("cu").as("cu_prev")),
        Seq("prev"), "left")
      .join(bigrams, Seq("prev", "w"), "left")
      .crossJoin(broadcast(total))
      .withColumn("logp",
        when(col("prev").isNull,
          log(col("cu").cast("double") / col("n_total")))
        .when(col("cb").isNotNull,
          log(col("cb").cast("double") / col("cu_prev")))
        .otherwise(
          log(lit(alpha) * col("cu").cast("double") / col("n_total"))))
    scored
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(round(col("logp"), 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
          .cast("double") / count(lit(1)), 6).as("avg_logp"))
  }
}
