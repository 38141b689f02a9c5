package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic salient-
  * term extractor (keyword features, topic hints, near-dup explanation).
  *
  * Scale shape: term frequency is one hash aggregation on (doc, term)
  * after an explode (rows ≈ tokens — the generator never materializes a
  * per-doc map); document frequency is a second aggregation over the
  * ALREADY-distinct (doc, term) pairs (so `count(*)` IS the document
  * frequency — no countDistinct pass over raw tokens); the score join
  * shuffles on `term` (vocabulary-sized, Zipf-skewed — AQE's skew-join
  * handles the stopword head); top-k per doc is a bounded window, never
  * a global sort.
  */
object Tfidf {

  /** (idCol, term, tf): term frequency per document. */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df): document frequency, computed from [[termFreq]] output
    * (one row per (doc, term), so a plain count is exact). */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** tf·ln(N/df), rounded to 6 decimals: the rounding makes the ranking
    * key identical across engines (ln may differ in the last ulp). */
  def tfidfScore(tf: Column, dfreq: Column, nDocs: Long): Column =
    round(tf.cast("double") * log(lit(nDocs.toDouble) / dfreq), 6)

  /** Top-`k` terms per document by (tfidf DESC, term ASC). `nDocs` is
    * the corpus size — any TF-IDF needs this one scalar; pass it in
    * (e.g. from a previous count) rather than forcing a count here.
    *
    * Document frequency comes from a window over the (doc, term)
    * pre-aggregation (one row per pair, so a plain count IS df) — a
    * `tf.join(docFreq(tf))` would re-derive the whole corpus explode
    * lineage on both join inputs. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               nDocs: Long, k: Int): DataFrame = {
    val tf = termFreq(df, idCol, textCol)
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("tfidf", tfidfScore(col("tf"), col("df"), nDocs))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
