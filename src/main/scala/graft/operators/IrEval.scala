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
}
