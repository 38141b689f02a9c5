package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, stopword stats, quality scoring, language guess,
  * content fingerprinting. All are pure column expressions (codegen'd,
  * shuffle-free, embarrassingly parallel over document rows) — the shape
  * that survives a 100 TB corpus unchanged.
  */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode-aware tokenization (VERDICT r09 #8): token = maximal run
    * of letters/digits in ANY script — the split class is
    * `[^\p{L}\p{N}]+`, syntax and semantics Java regex and RE2 share
    * for BMP scripts, so a DuckDB oracle tokenizes identically via
    * `regexp_split_to_array`. Leading/trailing separators produce
    * empty fragments in both engines; the filter drops them on both
    * sides. Use this over [[tokens]] when the corpus is multilingual
    * (post-NFC, d65) — the ASCII space split would glue Greek/CJK
    * tokens to their punctuation. */
  def tokensUnicode(text: Column): Column =
    filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Token-window PASSAGE CHUNKING — the embedding/RAG prep op: split
    * each document into windows of `size` tokens advancing by
    * `size − overlap`, so consecutive chunks share `overlap` tokens
    * (context preserved across boundaries for retrieval). Chunk count
    * per doc is `ceil((n − overlap) / step)` (1 when n ≤ size), so
    * the tail window is emitted once, never as an overlap-contained
    * duplicate. Pure per-row array expressions (codegen'd, zero
    * shuffle — at 100 TB this rides the corpus scan); the chunk id is
    * the 0-based window index. Emits (chunk_id, n_tokens, chunk) rows
    * via explode of a per-doc transform. */
  def chunkExprs(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunk size=$size overlap=$overlap: need 0 <= overlap < size")
    val step = size - overlap
    ExprLet.let(tokens(text)) { toks =>
      ExprLet.let(org.apache.spark.sql.functions.size(toks)) { n =>
        val nChunks = when(n <= size, lit(1))
          .otherwise(ceil((n - lit(overlap)).cast("double") / step)
            .cast("int"))
        transform(sequence(lit(0), nChunks - 1), i =>
          ExprLet.let(slice(toks, i * step + 1, lit(size))) { w =>
            struct(i.cast("long").as("chunk_id"),
              org.apache.spark.sql.functions.size(w).cast("long")
                .as("n_tokens"),
              concat_ws(" ", w).as("chunk"))
          })
      }
    }
  }

  /** Small fixed English stopword list (public, deterministic). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(Stopwords))).cast("long")

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs,
    * each with an optional leading space — the GPT-2 pretokenizer shape
    * minus lookaheads, restricted to syntax Java regex and RE2 share so
    * the SQL oracle counts identically. */
  val BpeishRe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Token count under [[BpeishRe]] (codegen'd regexp_count — no UDF). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishRe)).cast("long")

  /** Mean token length via an exact integer fold, then one double
    * division. The token array is let-bound — computed once, not once
    * per reference (see [[ExprLet]]). */
  def avgTokenLen(toks: Column): Column =
    ExprLet.let(toks) { ts =>
      aggregate(ts, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(ts)
    }

  /** Deterministic quality score in [0,1]: length saturation × stopword
    * penalty. Same arithmetic is expressible in ANSI SQL for the oracle;
    * the token array is let-bound (one tokenization per row). */
  def qualityScore(toks: Column): Column =
    ExprLet.let(toks) { ts =>
      least(size(ts).cast("double") / 50.0, lit(1.0)) *
        (lit(1.0) - stopwordCount(ts).cast("double") / size(ts))
    }

  /** Cheap language guess: marker-stopword heuristic ('the' → en). A real
    * n-gram profile model plugs in behind the same column contract. */
  def langGuess(toks: Column): Column =
    when(array_contains(toks, "the"), "en").otherwise("unknown")

  /** Stable content fingerprint (md5 hex — identical in any engine). */
  def fingerprint(text: Column): Column = md5(text)

  /** Deterministic hash bucket in [0, buckets) — the standard stateless
    * way to sample or split a corpus reproducibly: the assignment
    * depends only on content, so it is stable across runs, partitions,
    * cluster sizes, and engines. */
  def hashBucket(text: Column, buckets: Int): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long") % buckets

  /** Train/val/test assignment from the content hash (80/10/10). */
  def trainValTestSplit(text: Column): Column = {
    val b = hashBucket(text, 100)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** Character-level Shannon entropy per document — the
    * information-density quality signal (near-zero for
    * single-character junk, ~ln|alphabet| for uniform noise; natural
    * text sits in a band between, which is what entropy filters cut
    * on). One explode + two keyed aggregations; the per-character
    * −p·ln p terms are rounded to 8 dp and summed as DECIMAL so the
    * total is independent of aggregation order (double sums are not),
    * then rounded to 6 — the d69 ln-parenthesization discipline, so
    * any engine reproduces the score. Returns
    * `(idCol, n_chars, h_char)`. */
  def charEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs
      .select(col(idCol),
        explode(array_remove(split(col(textCol), ""), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("n"))
      .withColumn("len",
        sum("n").over(Window.partitionBy(col(idCol))))
    val p = col("n").cast("double") / col("len")
    cnt.groupBy(col(idCol)).agg(
        min("len").cast("long").as("n_chars"),
        round(-sum(round(p * log(p), 8).cast("decimal(28,8)")), 6)
          .cast("double").as("h_char"))
  }
}
