package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank fusion for hybrid retrieval — combine a lexical (BM25) and a
  * semantic (embedding-cosine) ranking of the same corpus into one
  * list, the standard first stage of a RAG serving stack. The
  * reference engine has no retrieval at all (its 4 files infer Hive
  * schemas); this extends the mandated LLM-pipeline surface next to
  * `Retrieval` (BM25) and `Similarity` (ANN).
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09):
  * `score(d) = Σ_sources 1 / (K + rank_source(d))` with K=60. RRF is
  * rank-only — scores from incomparable scales (BM25 vs cosine) never
  * mix, which is why it beats score normalization in practice and
  * why it fuses ANY rankers, not just these two.
  *
  * Scale shape: inputs are top-k lists — k·|queries| rows each, NOT
  * corpus-sized — so the union + (query, doc) aggregation moves a few
  * bounded kilobytes per query regardless of corpus size; the heavy
  * lifting stays in the arms (BM25's Σ df candidate path, ANN's
  * pruned buckets). Cross-engine determinism: each 1/(K+rk) contrib
  * rounds to 9 decimals and sums as DECIMAL(28,9) (addition-order-
  * proof, the bm25 discipline), the fused score rounds to 6, ties
  * break on doc_id.
  */
object Fusion {

  /** Fuse ranked lists (each `(query_id, doc_id, rk)`, rk 1-based)
    * into the top-`k` per query by RRF with constant `kConst`.
    * Returns `(query_id, rk, doc_id, score)`. */
  def rrf(ranked: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "rrf needs at least one ranking")
    val contribs = ranked.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      round(lit(1.0) / (lit(kConst) + col("rk")), 9)
        .cast(DecimalType(28, 9)).as("contrib")))
    contribs.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib").cast("double"), 6).as("score"))
      .withColumn("rk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("score"))
  }
}
