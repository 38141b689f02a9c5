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
  * Scale shape: ONE corpus pass builds positions WITH their one-left
  * context attached by a doc-keyed window (round 19 — the old
  * shifted self-join shuffled the token stream twice to look one
  * position left); unigrams and bigrams are hash aggregations over
  * it; scoring joins positions against the two count tables on their
  * natural keys (broadcast when the vocabulary is small, shuffle
  * joins on (prev, w) at web scale — declarative either way) and
  * folds per doc. Cross-engine
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
    // Context attach via LAG over (doc, i) instead of the shifted
    // (doc, i)-keyed self-join (round 19, guide §2.4): the join
    // shuffled the token stream TWICE (once per side) just to look
    // one position left; one window pays a single doc-keyed exchange
    // + sort. The lag(i) guard keeps the join's exact semantics when
    // the tokenizer leaves position gaps (a filtered empty token at
    // i−1 must yield NO context, not the last surviving token).
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    val pos = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tok(col(textCol))).as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("prev",
        when(lag(col("i"), 1).over(byPos) === col("i") - 1,
          lag(col("w"), 1).over(byPos)))
      // consumed four times (unigrams, totals, bigram counts, final
      // scoring): checkpoint so the corpus posexplode + context
      // window run once (the Dsir discipline)
      .localCheckpoint()
    val uni = pos.groupBy("w").agg(count(lit(1)).as("cu"))
    val total = pos.agg(count(lit(1)).cast("long").as("n_total"))
    val bigrams = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "w").agg(count(lit(1)).as("cb"))
    val scored = pos
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
