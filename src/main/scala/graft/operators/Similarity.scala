package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline: a broadcast of
  * the (tiny) query vector against a scan of the corpus — one pass, no
  * shuffle except the final TakeOrdered. The scale path is sign-bit LSH
  * bucketing: candidates come only from the query's bucket, so the scan
  * prunes to corpus/2^bits on average; the same idea extends to IVF with
  * learned centroids.
  *
  * All folds are sequential left-folds in DOUBLE so results are
  * bit-identical across engines (float→double widening is exact; the
  * fold order is the only rounding freedom and both engines fold left).
  */
object Similarity {

  /** Embedding column widened to DOUBLE (exact). */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket from the first `bits` dimensions (axis-aligned
    * random-hyperplane family). */
  def signBucket(emb: Column, bits: Int = 8): Column =
    concat((1 to bits).map(i =>
      when(element_at(emb, i) > 0f, "1").otherwise("0")): _*)

  /** Brute-force cosine top-k against the embedding of `queryId`. */
  def cosineTopK(spark: SparkSession, emb: DataFrame, idCol: String,
                 embCol: String, queryId: Long, k: Int): DataFrame = {
    val e = emb.select(col(idCol), asDouble(col(embCol)).as("v"))
    val q = e.filter(col(idCol) === queryId).select(col("v").as("qv"))
    e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-pruned cosine top-k: only the query's sign bucket is scanned. */
  def bucketTopK(spark: SparkSession, emb: DataFrame, idCol: String,
                 embCol: String, queryId: Long, k: Int, bits: Int = 8): DataFrame = {
    val e = emb.select(
      col(idCol), asDouble(col(embCol)).as("v"),
      signBucket(col(embCol), bits).as("bucket"))
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.join(broadcast(q), col("bucket") === col("qbucket") && col(idCol) =!= queryId)
      .select(col(idCol), col("bucket"), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
