package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie, Santurkar,
  * Ma & Liang, NeurIPS 2023): score every raw document by how much
  * more likely its hashed n-gram features are under a TARGET
  * distribution than under the raw-corpus distribution,
  * `log w(doc) = Σ_features [ln p_target(b) − ln p_raw(b)]`,
  * with features = unigrams ∪ bigrams hashed into `nBuckets` buckets
  * and both distributions Laplace-smoothed bucket histograms.
  * Sampling ∝ w then selects target-like data from the raw pool.
  *
  * Why it scales (the paper's point, kept intact): the importance
  * model is O(nBuckets) — two bucket histograms — NO corpus-sized
  * model state. Here that means the λ(b) table is a few hundred rows
  * and BROADCASTS unconditionally; the corpus is touched by one
  * feature explode + hash aggregations, and per-doc scoring is a
  * broadcast join + decimal fold. At 100 TB nothing in the plan
  * grows except the embarrassingly-parallel feature scan.
  *
  * Hashing is md5-derived (the engine-wide discipline — DuckDB
  * replays `('0x' || substr(md5(f), 1, 15))::BIGINT % B` exactly);
  * per-feature λ rounds to 9 dp and sums as DECIMAL, the final
  * log-weight rounds to 6.
  */
object Dsir {

  /** `(doc_id, n_feats, log_weight)` for every document; `isTarget`
    * marks the rows defining the target distribution (in production a
    * curated corpus — any deterministic predicate or join flag). */
  def logImportanceWeights(docs: DataFrame, idCol: String,
                           textCol: String, isTarget: Column,
                           nBuckets: Int = 256,
                           tok: Column => Column = TextAnalysis.tokens)
      : DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        tok(col(textCol)).as("t"))
      .select(col("doc_id"), col("tgt"),
        // unigrams ++ bigrams; Spark's sequence(1, 0) DESCENDS, so
        // the bigram branch is guarded rather than relying on an
        // empty range (the BpeTrain lesson)
        explode(concat(col("t"),
          when(size(col("t")) >= 2,
            transform(sequence(lit(1), size(col("t")) - 1),
              k => concat(element_at(col("t"), k), lit(" "),
                element_at(col("t"), k + 1))))
            .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("doc_id"), col("tgt"),
        (conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long")
          % nBuckets).as("b"))
      // consumed four times (raw, target, totals, final scoring
      // join): checkpoint so the tokenize + bigram explode + md5 of
      // the corpus runs ONCE — without it the "one feature explode"
      // scale claim above is false by 4x
      .localCheckpoint()
    val raw = feats.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("tgt"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = feats.agg(count(lit(1)).as("nr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("nt"))
    // λ(b) = ln p_target(b) − ln p_raw(b), Laplace-smoothed — the
    // whole importance model, nBuckets rows, broadcast
    val lam = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("nt") + lit(nBuckets.toDouble))) -
          log((col("cr") + lit(1.0)) /
            (col("nr") + lit(nBuckets.toDouble))), 9)
          .cast(DecimalType(28, 9)).as("lam"))
    feats.join(broadcast(lam), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("lam")).cast("double"), 6).as("log_weight"))
  }
}
