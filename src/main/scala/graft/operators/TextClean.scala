package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text scrubbing for training corpora: remove emails/URLs (the common
  * PII/noise pass before tokenization). Pure codegen'd regexp columns —
  * embarrassingly parallel, no shuffle. Regexes restricted to syntax
  * shared by Java regex and RE2 so the SQL oracle matches exactly.
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  def scrubEmails(c: Column): Column = regexp_replace(c, EmailRe, "")
  def scrubUrls(c: Column): Column = regexp_replace(c, UrlRe, "")
  def scrub(c: Column): Column = scrubUrls(scrubEmails(c))

  def hasEmail(c: Column): Column = c.rlike(EmailRe)
  def hasUrl(c: Column): Column = c.rlike(UrlRe)

  // --- Corpus-level boilerplate (repeated-segment) detection ----------
  //
  // CCNet-style paragraph dedup: a segment that recurs across documents
  // (headers, footers, nav text, license blurbs) is boilerplate and
  // should not be trained on. With no natural paragraph breaks we
  // segment into non-overlapping `k`-token chunks; the document
  // frequency of each distinct segment is ONE corpus-wide hash
  // aggregation (shuffle on the segment key — never all-pairs), and
  // flagging joins the tiny high-frequency remainder back to segments.

  /** Non-overlapping `k`-token segments of a token array (last partial
    * chunk dropped); empty array below `k` tokens. */
  def segments(toks: Column, k: Int): Column =
    graft.operators.ExprLet.let(toks) { ts =>
      when(size(ts) >= k,
        transform(
          sequence(lit(0), call_function("div", size(ts), lit(k)).cast("int") - 1),
          i => concat_ws(" ", slice(ts, i * k + 1, lit(k)))))
        .otherwise(array())
    }

  /** Strided (overlapping) `k`-token chunks — the RAG/pretraining
    * chunking shape: chunk `c` covers tokens `[c·stride+1, c·stride+k]`
    * (the final chunk truncates at the end of the doc); every token
    * lands in at least one chunk since `stride <= k`. */
  def chunks(toks: Column, k: Int, stride: Int): Column = {
    require(stride >= 1 && stride <= k, s"need 1 <= stride <= k, got $stride/$k")
    graft.operators.ExprLet.let(toks) { ts =>
      // Empty-array guard (same as segments): sequence(0, -1) would
      // count DOWN to [0, -1], emitting phantom chunks.
      when(size(ts) >= 1,
        transform(
          sequence(lit(0),
            call_function("div", size(ts) + (stride - 1), lit(stride)).cast("int") - 1),
          c => concat_ws(" ", slice(ts, c * stride + 1, lit(k)))))
        .otherwise(array())
    }
  }

  /** Explode `df` into (idCol, seg) rows of `k`-token segments. */
  def explodeSegments(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame =
    df.select(col(idCol),
      explode(segments(split(col(textCol), " "), k)).as("seg"))

  /** Per-document boilerplate stats: segments whose document frequency
    * across the whole corpus is >= `minDf` count as boilerplate.
    * Returns (idCol, n_segs, n_boiler).
    *
    * Single pass, no cache: pre-aggregate occurrences per (seg, doc),
    * read the document frequency off a window partitioned by seg (one
    * row per (seg, doc) after the pre-agg, so plain count == distinct
    * docs), then re-aggregate per doc. Three shuffles on shrinking
    * data, and — unlike a persist + self-join — no pinned cache entry
    * leaking into whatever else runs in the session. */
  def boilerplateStats(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, minDf: Int = 2): DataFrame = {
    val perDocSeg = explodeSegments(df, idCol, textCol, k)
      .groupBy(col("seg"), col(idCol))
      .agg(count(lit(1)).as("occ"))
    val docFreq = org.apache.spark.sql.expressions.Window.partitionBy("seg")
    perDocSeg
      .withColumn("df", count(lit(1)).over(docFreq))
      .groupBy(idCol)
      .agg(
        sum("occ").as("n_segs"),
        sum(when(col("df") >= minDf, col("occ")).otherwise(0L)).as("n_boiler"))
  }
}
