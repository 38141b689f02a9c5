package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked and boolean retrieval over an inverted index — the serving
  * side of a training-data pipeline (corpus search, eval-set mining,
  * hard-negative sourcing) next to d29's TF-IDF feature extractor.
  *
  * Scale shape (100 TB corpus, small query set):
  *  - the postings list `(term, doc, tf, dl)` is ONE hash aggregation
  *    over the exploded tokens; the per-doc length rides along from a
  *    pre-explode projection (the standard index layout's doc-length
  *    array, denormalized) so scoring never needs a second corpus pass
  *    or a join back to the documents table;
  *  - the query set is tiny → it BROADCASTS, and the postings side
  *    filters to query terms without shuffling the index (at rest the
  *    postings would be bucketed by term, making this a pruned scan);
  *  - document frequency for the query terms is exact from the
  *    filtered slice (postings are distinct per (doc, term), so a
  *    plain count per term IS df) — no full-vocabulary aggregation on
  *    the serve path;
  *  - corpus constants (N, avgdl) are a 1-row aggregate, broadcast via
  *    crossJoin;
  *  - per-(query, doc) accumulation shuffles only the filtered slice,
  *    and top-k per query is a bounded window, never a global sort.
  *
  * Cross-engine determinism: each term's score contribution is rounded
  * to 9 decimals and summed as DECIMAL (addition order across terms is
  * engine-dependent; decimal addition is exact), and the final score
  * rounds to 6 — the d28/tfidf discipline.
  */
object Retrieval {

  /** Inverted postings `(term, doc, tf, dl)`: one explode + one hash
    * aggregation; `dl` (doc token count) is computed before the explode
    * and carried through `first` (constant within the (doc, term)
    * group). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))

  /** Corpus constants for BM25: (n_docs, avgdl). avgdl is one exact
    * integer division sum_tokens/n as DOUBLE — deterministic across
    * engines. */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(TextAnalysis.tokens(col(textCol))).cast("long"))
        .cast("double") / count(lit(1))).as("avgdl"))

  /** Persist the index for serving, in the three-table layout a real
    * text engine keeps (a Lucene segment's shape, relational):
    *
    *  - `postings/` `(term, doc_id, tf, dl)` PARTITIONED BY `tb`, a
    *    hash bucket of the term — a query's scan prunes to the
    *    partitions its terms hash into (the s15 file-level-pruning
    *    design applied to text), and APPEND is a pure file add;
    *  - `terms/` `(term, df)`, also `tb`-partitioned — the term
    *    DICTIONARY. df lives HERE, not denormalized into postings:
    *    appending docs changes every affected term's corpus-wide df,
    *    and a denormalized df would force rewriting old postings
    *    (the reason [[appendIndex]] can exist at all);
    *  - `stats/` one row of EXACT integers `(n_docs, sum_tokens)` —
    *    avgdl is derived at serve time, so merged stats after an
    *    append stay exact (a stored double avgdl could not be
    *    combined without drift). */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 dir: String, nBuckets: Int): Unit = {
    val posts = postings(docs, idCol, textCol)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)))
    posts.write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/postings")
    // df from the freshly-written postings (one scan of the new files,
    // not a second corpus explode)
    docs.sparkSession.read.parquet(s"$dir/postings")
      .groupBy("tb", "term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/terms")
    exactStats(docs, textCol)
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** `(n_docs, sum_tokens)` as exact longs — the mergeable form. */
  private def exactStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(TextAnalysis.tokens(col(textCol))).cast("long"))
        .cast("long").as("sum_tokens"))

  /** Stored stats → the `(n_docs, avgdl)` shape the scorer consumes
    * (one exact integer division as DOUBLE). */
  def readStats(spark: org.apache.spark.sql.SparkSession,
                dir: String): DataFrame =
    spark.read.parquet(s"$dir/stats")
      .select(col("n_docs"),
        (col("sum_tokens").cast("double") / col("n_docs")).as("avgdl"))

  /** Incrementally ADD documents to a stored index: new postings
    * APPEND into the `tb` partitions (old files untouched); the term
    * dictionary is rewritten as old ∪ new with summed df (vocabulary-
    * sized — the segment-merge cost a text engine pays on commit, NOT
    * a corpus rewrite), swapped in with two renames; stats merge as
    * exact integer adds. Serving an appended index must equal a
    * fresh build over the union corpus — d71 holds that under the
    * oracle gate. */
  def appendIndex(newDocs: DataFrame, idCol: String, textCol: String,
                  dir: String, nBuckets: Int): Unit = {
    val spark = newDocs.sparkSession
    val newPosts = postings(newDocs, idCol, textCol)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)))
    newPosts.write.mode("append").partitionBy("tb")
      .parquet(s"$dir/postings")
    spark.read.parquet(s"$dir/terms")
      .unionByName(
        newPosts.groupBy("tb", "term").agg(count(lit(1)).as("df")))
      .groupBy("tb", "term").agg(sum("df").cast("long").as("df"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/terms_new")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(s"$dir/terms_retired"), true)
    require(fs.rename(p(s"$dir/terms"), p(s"$dir/terms_retired")),
      "appendIndex: rename-out of the term dictionary failed")
    require(fs.rename(p(s"$dir/terms_new"), p(s"$dir/terms")),
      "appendIndex: rename-in of the merged term dictionary failed")
    val old = spark.read.parquet(s"$dir/stats")
      .select(col("n_docs").cast("long"), col("sum_tokens").cast("long"))
      .head()
    val add = exactStats(newDocs, textCol)
      .select(col("n_docs").cast("long"), col("sum_tokens").cast("long"))
      .head()
    import spark.implicits._
    // values are already collected — overwriting the path read above
    // is safe, nothing lazy still points at it
    Seq((old.getLong(0) + add.getLong(0), old.getLong(1) + add.getLong(1)))
      .toDF("n_docs", "sum_tokens")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Serve-time slice of the stored index for a (tiny) term set,
    * df attached from the dictionary: the term-bucket literals make
    * BOTH partition filters STATIC, so only the files those buckets
    * own are read. The bucket computation is a bounded collect over
    * the query terms (the w25 centroid-literal discipline). */
  def readIndexSlice(spark: org.apache.spark.sql.SparkSession, dir: String,
                     terms: Seq[String], nBuckets: Int): DataFrame = {
    import spark.implicits._
    val buckets = terms.toDS()
      .select(pmod(xxhash64(col("value")), lit(nBuckets)).as("tb"))
      .distinct().as[Long].collect().toSeq
    def pruned(sub: String) = spark.read.parquet(s"$dir/$sub")
      .filter(col("tb").isInCollection(buckets) &&
        col("term").isInCollection(terms))
      .drop("tb")
    pruned("postings").join(broadcast(pruned("terms")), "term")
  }

  /** BM25 over an index slice that already carries `df` (the stored
    * layout of [[writeIndex]]) — no aggregation over the index, just
    * scoring + per-query top-k. */
  def bm25TopKIndexed(slice: DataFrame, queries: DataFrame,
                      stats: DataFrame, k: Int, k1: Double = 1.2,
                      b: Double = 0.75): DataFrame =
    rank(slice.join(broadcast(queries), "term")
      .crossJoin(broadcast(stats)), k, k1, b)

  /** Okapi BM25 (Robertson & Spärck Jones; the Lucene `+1` idf variant
    * that keeps weights positive):
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * `w = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
    * `queries` is `(query_id, term)` — one row per query term. Returns
    * the top-`k` docs per query as `(query_id, rk, doc_id, score)`. */
  def bm25TopK(posts: DataFrame, queries: DataFrame, stats: DataFrame,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Serve-path slice: broadcast the distinct query terms; only
    // postings rows for query terms survive (no shuffle of the index).
    val slice = posts.join(broadcast(queries.select("term").distinct()), "term")
    // df per query term as a WINDOW over the slice — the slice is
    // distinct per (doc, term), so a count partitioned by term IS the
    // corpus df, and the window re-uses the slice instead of
    // re-deriving the postings lineage from a second corpus scan (the
    // plan-audit lesson from d29's tfidf). The shuffle it costs moves
    // only the query-term slice, never the index.
    rank(slice
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(broadcast(queries), "term")   // attach query_ids
      .crossJoin(broadcast(stats)), k, k1, b)
  }

  /** Shared scoring tail: expects (query_id, doc_id, term, tf, dl, df,
    * n_docs, avgdl) rows; one (query, doc) aggregation + a bounded
    * per-query window. */
  private def rank(scoredInput: DataFrame, k: Int,
                   k1: Double, b: Double): DataFrame =
    scoredInput
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("contrib",
        round(col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("contrib")).cast("double"), 6).as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score")

  /** Conjunctive boolean retrieval: docs containing EVERY term of
    * `terms`. One broadcast filter + one count-match aggregation over
    * the (already (doc, term)-distinct) postings — the distributed
    * equivalent of df-ascending posting-list intersection (the group
    * count reaches `terms.size` iff every list contains the doc).
    * Returns `(doc_id, n_hits)` where n_hits = total tf over the
    * query terms. */
  def booleanAnd(posts: DataFrame, terms: Seq[String]): DataFrame =
    posts
      .filter(col("term").isInCollection(terms))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("n_hits"))
      .filter(col("n_terms") === terms.size)
      .select("doc_id", "n_hits")
}
