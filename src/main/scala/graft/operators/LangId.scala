package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained language identification — a Cavnar–Trenkle-style character
  * n-gram profile classifier (the classic "Text Categorization of
  * N-Gram Frequency" method), replacing the marker-word heuristic of
  * [[TextAnalysis.langGuess]] with a model trained FROM the labeled
  * corpus itself.
  *
  * Train: per language, rank character trigrams by frequency and keep
  * the top [[ProfileSize]] — the profile. State is bounded by the
  * alphabet (distinct trigrams), not the corpus, so profiles stay a
  * broadcast-sized table at any input scale.
  *
  * Classify: rank each document's top [[DocTop]] trigrams, then score
  * each candidate language by the out-of-place distance
  * `Σ |doc_rank − profile_rank|` (missing trigram → ProfileSize+1).
  * All-integer arithmetic with lexicographic tie-breaks — bit-identical
  * in any engine, which is what lets the DuckDB oracle check it.
  *
  * Scale shape: one explode (rows ≈ chars), two hash aggregations with
  * map-side partial aggregation, a per-document window (key = doc id,
  * never global), and broadcast joins against the tiny profile/language
  * tables. No all-pairs anything.
  */
object LangId {

  /** Trigrams kept per language profile. */
  val ProfileSize = 100
  /** Top document trigrams scored against each profile. */
  val DocTop = 20

  /** Character trigrams of the lowercased text (empty if < 3 chars).
    * Let-bound so the lowercase runs once per row, not once per
    * element (HOF lambdas re-evaluate outer references). */
  def charTrigrams(text: Column): Column =
    ExprLet.let(lower(text)) { s =>
      when(length(s) >= 3,
        transform(sequence(lit(1), length(s) - 2), i => s.substr(i, lit(3))))
        .otherwise(typedlit(Array.empty[String]))
    }

  /** One row per (id-cols..., trigram). */
  private def grams(docs: DataFrame, textCol: String, keep: Column*): DataFrame =
    docs.select(keep :+ explode(charTrigrams(col(textCol))).as("_g"): _*)

  /** Per-language top-[[ProfileSize]] trigram ranks: (lang, _g, _r). */
  def profiles(docs: DataFrame, textCol: String, langCol: String): DataFrame =
    grams(docs, textCol, col(langCol))
      .groupBy(col(langCol), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(langCol).orderBy(col("_c").desc, col("_g").asc)))
      .filter(col("_r") <= ProfileSize)
      .drop("_c")

  /** Predicted language per document: (idCol, trueLangCol, pred).
    * `profiles` must be the output of [[profiles]] (or any small
    * (lang, _g, _r) table) — it is broadcast. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               langCol: String, prof: DataFrame): DataFrame = {
    val docRanks = grams(docs, textCol, col(idCol), col(langCol))
      .groupBy(col(idCol), col(langCol), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_dr", row_number().over(
        Window.partitionBy(idCol).orderBy(col("_c").desc, col("_g").asc)))
      .filter(col("_dr") <= DocTop)
      .drop("_c")
    val langs = prof.select(col(prof.columns.head).as("_cand")).distinct()
    val p = prof.toDF("_plang", "_pg", "_pr")
    val scored = docRanks
      .crossJoin(broadcast(langs))
      .join(broadcast(p),
        col("_cand") === col("_plang") && col("_g") === col("_pg"), "left")
      .groupBy(col(idCol), col(langCol), col("_cand"))
      .agg(sum(abs(col("_dr") - coalesce(col("_pr"), lit(ProfileSize + 1))))
        .cast("long").as("_dist"))
    scored
      .withColumn("_pred_rank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("_dist").asc, col("_cand").asc)))
      .filter(col("_pred_rank") === 1)
      .select(col(idCol), col(langCol), col("_cand").as("pred"))
  }
}
