package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval EVALUATION — the trec_eval triple every serving
  * change is judged by, relational: given a RUN
  * `(query_id, rk, doc_id)` (any of the engine's top-k scorers) and
  * graded QRELS `(query_id, doc_id, rel)`:
  *
  *  - `ndcg@k` — DCG with the standard `(2^rel − 1) / log2(rk + 1)`
  *    gain over the run's top-k, normalized by the ideal DCG (the
  *    qrels' own grades sorted descending — ties don't matter, equal
  *    grades contribute equally at either position);
  *  - `mrr` — 1 / rank of the first relevant (rel > 0) result, 0 if
  *    none retrieved;
  *  - `recall@k` — retrieved-relevant over total-relevant.
  *
  * Shape: the run is k·|queries| rows and qrels are judgment-sized,
  * so everything after the one broadcast join is bounded — the
  * corpus never appears. Cross-engine determinism: per-rank DCG
  * terms round to 9 and sum as DECIMAL (addition-order-free), final
  * metrics round to 6; queries with NO relevant docs in qrels score
  * 0 across the board rather than dropping (a run must be judged on
  * every query it served).
  *
  * Reference scope note: the reference bundle has no retrieval; this
  * closes the loop on the d67-family serving surface (a pipeline
  * that cannot score its own ranking changes cannot tune them).
  */
object IrEval {

  /** Rank-Biased Overlap at depth `k` (Webber, Moffat & Zobel, TOIS
    * 2010) between two ranked runs — the standard "how much did my
    * ranking change" monitor, top-weighted by the persistence
    * parameter `p` (a doc agreeing at rank 1 matters ~1/p× more than
    * at rank 2): `RBO@k = (1−p) · Σ_{d=1..k} p^{d−1} · X_d / d`
    * where `X_d` is the overlap of the two top-d prefixes.
    *
    * Relational form, no depth explosion: only the (query, doc)
    * pairs PRESENT IN BOTH runs matter — a common doc with ranks
    * (ra, rb) is inside both top-d prefixes exactly for
    * d ≥ max(ra, rb), so its total contribution is the closed
    * per-doc sum `Σ_{d=max(ra,rb)}^{k} p^{d−1}/d`, evaluated as a
    * ≤ k-term HOF fold on the joined row. One k·|queries|-sized
    * equi-join + one aggregation. The truncated sum is NORMALIZED by
    * its own maximum `1 − p^k` (perfect agreement at every depth),
    * so identical full runs score exactly 1 and disjoint ones 0 —
    * the bounded-monitor form of RBO_min. Per-doc sums round to 9
    * and aggregate as DECIMAL, the final score rounds to 6. */
  def rbo(runA: DataFrame, runB: DataFrame, k: Int,
          p: Double = 0.9): DataFrame = {
    val a = runA.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").as("ra"))
    val b = runB.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").as("rb"))
    a.join(b, Seq("query_id", "doc_id"))
      .withColumn("contrib",
        round(lit(1.0 - p) * aggregate(
          sequence(greatest(col("ra"), col("rb")).cast("int"), lit(k)),
          lit(0.0),
          (acc, d) => acc + pow(lit(p), d - 1) / d), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
      .groupBy("query_id")
      .agg(round(sum(col("contrib")).cast("double") /
        (lit(1.0) - pow(lit(p), lit(k))), 6).as("rbo"))
  }

  /** Per-query metrics: `(query_id, ndcg, mrr, recall)` for the
    * run's top-`k`. `qrels` rows with rel <= 0 are ignored as
    * non-relevant judgments. */
  def evaluate(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val topk = run.filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"))
    val rel = qrels.filter(col("rel") > 0)
      .select(col("query_id"), col("doc_id"),
        col("rel").cast("long").as("rel"))
    // gain at the retrieved rank (unjudged docs gain 0)
    val hits = topk.join(broadcast(rel), Seq("query_id", "doc_id"),
        "left")
      .withColumn("gain",
        round((pow(lit(2.0), coalesce(col("rel"), lit(0L))) - 1.0) /
          (log(col("rk") + 1.0) / log(lit(2.0))), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
    val dcg = hits.groupBy("query_id").agg(
      sum(col("gain")).as("dcg"),
      min(when(col("rel") > 0, col("rk"))).as("first_rel"),
      count(when(col("rel") > 0, lit(1))).cast("long").as("n_hit"))
    // ideal DCG: the query's own grades, best-first, capped at k
    val ideal = rel
      .withColumn("irk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rel").desc, col("doc_id").asc)))
      .withColumn("igain",
        when(col("irk") <= k,
          round((pow(lit(2.0), col("rel")) - 1.0) /
            (log(col("irk") + 1.0) / log(lit(2.0))), 9))
          .otherwise(lit(0.0))
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
      .groupBy("query_id").agg(
        sum(col("igain")).as("idcg"),
        count(lit(1)).cast("long").as("n_rel"))
    topk.select("query_id").distinct()
      .join(dcg, Seq("query_id"), "left")
      .join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        when(coalesce(col("idcg"), lit(0)).cast("double") > 0.0,
          round(col("dcg").cast("double") /
            col("idcg").cast("double"), 6))
          .otherwise(lit(0.0)).as("ndcg"),
        coalesce(round(lit(1.0) / col("first_rel"), 6), lit(0.0))
          .as("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          round(col("n_hit").cast("double") / col("n_rel"), 6))
          .otherwise(lit(0.0)).as("recall"))
  }

  /** Exact binary-classifier evaluation (d130): tie-corrected
    * Mann-Whitney ROC-AUC with an ALL-INTEGER numerator, plus the
    * confusion matrix at threshold `thr`. Input rows carry a 0/1
    * `pos` and a bounded integer `score`; the corpus collapses to
    * per-score-level (n_pos, n_neg) counts FIRST, so the ordering
    * window runs over the score domain (bounded at any corpus
    * size), never the rows. AUC = (2·Σ n_pos·neg_below +
    * Σ n_pos·n_neg_tied) / (2·N⁺·N⁻) — one IEEE division at the
    * end, engine-identical; derived rates round to 9. */
  def binaryEval(df: DataFrame, pos: org.apache.spark.sql.Column,
                 score: org.apache.spark.sql.Column,
                 thr: Long): DataFrame = {
    val base = df.select(pos.cast("long").as("pos"),
      score.cast("long").as("score"))
    val g = base.groupBy("score").agg(
      sum("pos").cast("long").as("n_pos"),
      (count(lit(1)) - sum("pos")).cast("long").as("n_neg"))
    // Bounded-domain window: the caller's score domain caps the
    // frame (d130: ≤ 1001 levels) regardless of corpus size.
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lv = g.withColumn("cneg",
      coalesce(sum("n_neg").over(w), lit(0L)))
    val d = (c: String) => col(c).cast("double")
    lv.agg(
        sum("n_pos").cast("long").as("n_pos"),
        sum("n_neg").cast("long").as("n_neg"),
        sum(lit(2L) * col("n_pos") * col("cneg") +
          col("n_pos") * col("n_neg")).cast("long").as("auc_num2"),
        sum(when(col("score") >= thr, col("n_pos"))
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("score") >= thr, col("n_neg"))
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("score") < thr, col("n_pos"))
          .otherwise(0L)).cast("long").as("fn"),
        sum(when(col("score") < thr, col("n_neg"))
          .otherwise(0L)).cast("long").as("tn"))
      .select(col("n_pos"), col("n_neg"), col("auc_num2"),
        // Degenerate-input guards (ADVICE r12): a one-class corpus
        // must report auc NULL (binaryEvalBy's convention), never a
        // 0/0 whose result differs cross-engine (Spark non-ANSI
        // NULL vs DuckDB inf/NaN); prec/f1 take prCurve's 0/0
        // conventions (no positive predictions → prec 1.0, tp = 0 →
        // f1 0.0), rec is NULL when there are no positives at all.
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(d("auc_num2") /
            (lit(2.0) * d("n_pos") * d("n_neg")), 9)).as("auc"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        round((d("tp") + d("tn")) /
          (d("n_pos") + d("n_neg")), 9).as("accuracy"),
        round(when(col("tp") + col("fp") === 0L, 1.0)
          .otherwise(d("tp") / (d("tp") + d("fp"))), 9).as("prec"),
        when(col("n_pos") === 0L, lit(null))
          .otherwise(round(d("tp") / (d("tp") + d("fn")), 9))
          .as("rec"),
        round(when(col("tp") === 0L, 0.0)
          .otherwise(lit(2.0) * d("tp") /
            (lit(2.0) * d("tp") + d("fp") + d("fn"))), 9).as("f1"))
  }

  /** Per-slice [[binaryEval]] (d138) — the fairness-audit form:
    * every metric computed independently per value of `slice`
    * (language, source, …), in ONE pass: level counts group by
    * (slice, score), the below-count window partitions by slice (so
    * each frame stays bounded by the score domain), and the rollup
    * groups by slice. Slices with one class report auc = null
    * rather than a fabricated number. */
  def binaryEvalBy(df: DataFrame, slice: org.apache.spark.sql.Column,
                   pos: org.apache.spark.sql.Column,
                   score: org.apache.spark.sql.Column,
                   thr: Long): DataFrame = {
    val base = df.select(slice.as("slice"),
      pos.cast("long").as("pos"), score.cast("long").as("score"))
    val g = base.groupBy("slice", "score").agg(
      sum("pos").cast("long").as("n_pos"),
      (count(lit(1)) - sum("pos")).cast("long").as("n_neg"))
    val w = Window.partitionBy("slice").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lv = g.withColumn("cneg",
      coalesce(sum("n_neg").over(w), lit(0L)))
    val d = (c: String) => col(c).cast("double")
    lv.groupBy("slice").agg(
        sum("n_pos").cast("long").as("n_pos"),
        sum("n_neg").cast("long").as("n_neg"),
        sum(lit(2L) * col("n_pos") * col("cneg") +
          col("n_pos") * col("n_neg")).cast("long").as("auc_num2"),
        sum(when(col("score") >= thr, col("n_pos"))
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("score") >= thr, col("n_neg"))
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("score") < thr, col("n_pos"))
          .otherwise(0L)).cast("long").as("fn"),
        sum(when(col("score") < thr, col("n_neg"))
          .otherwise(0L)).cast("long").as("tn"))
      .select(col("slice"), col("n_pos"), col("n_neg"),
        col("auc_num2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(d("auc_num2") /
            (lit(2.0) * d("n_pos") * d("n_neg")), 9)).as("auc"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        round((d("tp") + d("tn")) /
          (d("n_pos") + d("n_neg")), 9).as("accuracy"))
      .orderBy("slice")
  }

  /** Precision/recall curve at the given thresholds (d134): the
    * corpus collapses to score levels once (the binaryEval shape),
    * then a broadcast cross join against the |thrs|-row threshold
    * frame feeds ONE conditional aggregate — per-threshold exact
    * integer tp/fp/fn and the derived rates. Thresholds with an
    * empty positive prediction set report precision 1.0 by the
    * usual convention (0/0 → no false positives). */
  def prCurve(df: DataFrame, pos: org.apache.spark.sql.Column,
              score: org.apache.spark.sql.Column,
              thrs: Seq[Long]): DataFrame = {
    val base = df.select(pos.cast("long").as("pos"),
      score.cast("long").as("score"))
    val g = base.groupBy("score").agg(
      sum("pos").cast("long").as("n_pos"),
      (count(lit(1)) - sum("pos")).cast("long").as("n_neg"))
    val sp = df.sparkSession
    import sp.implicits._
    val tf = thrs.toDF("thr")
    val d = (c: String) => col(c).cast("double")
    g.crossJoin(broadcast(tf))
      .groupBy("thr").agg(
        sum(when(col("score") >= col("thr"), col("n_pos"))
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("score") >= col("thr"), col("n_neg"))
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("score") < col("thr"), col("n_pos"))
          .otherwise(0L)).cast("long").as("fn"))
      .select(col("thr").cast("long").as("thr"),
        col("tp"), col("fp"), col("fn"),
        round(when(col("tp") + col("fp") === 0L, 1.0)
          .otherwise(d("tp") / (d("tp") + d("fp"))), 9).as("prec"),
        round(d("tp") / (d("tp") + d("fn")), 9).as("rec"),
        round(when(col("tp") === 0L, 0.0)
          .otherwise(lit(2.0) * d("tp") /
            (lit(2.0) * d("tp") + d("fp") + d("fn"))), 9).as("f1"))
      .orderBy("thr")
  }
}
