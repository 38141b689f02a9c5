package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class RetrievalSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark joins data with hash joins"),
    (1L, "sort merge joins shuffle data"),
    (2L, "broadcast joins skip the shuffle"),
    (3L, "window functions rank data"))
    .toDF("doc_id", "text")

  describe("Retrieval.postings") {
    it("emits (doc, term, tf, dl) with exact counts") {
      val p = Retrieval.postings(corpus, "doc_id", "text")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(p.contains((0L, "joins", 2L, 6L)))   // tf 2, dl 6
      assert(p.contains((3L, "rank", 1L, 4L)))
      assert(p.count(_._1 == 0L) == 5)            // 5 distinct terms in doc 0
    }
  }

  describe("Retrieval.bm25TopK") {
    it("matches a hand-computed BM25 score and ranks exact-tf-2 first") {
      val posts = Retrieval.postings(corpus, "doc_id", "text")
      val stats = Retrieval.corpusStats(corpus, "text")
      val q = Seq((1L, "joins")).toDF("query_id", "term")
      val top = Retrieval.bm25TopK(posts, q, stats, k = 4)
        .as[(Long, Long, Long, Double)].collect().toList
      // df(joins)=3, N=4 → idf = ln(1 + 1.5/3.5); avgdl = 20/4 = 5.0
      val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
      def w(tf: Long, dl: Long): Double = {
        val c = BigDecimal(idf * (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / 5.0)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        c.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(top.map(_._3) == List(0L, 1L, 2L)) // tf2@dl6, then dl5 tie → id
      assert(top.head._4 == w(2, 6))
      assert(top(1)._4 == w(1, 5))
      assert(top(2)._4 == w(1, 5))
    }
    it("a term absent from the corpus contributes no rows") {
      val posts = Retrieval.postings(corpus, "doc_id", "text")
      val stats = Retrieval.corpusStats(corpus, "text")
      val q = Seq((1L, "nonexistent")).toDF("query_id", "term")
      assert(Retrieval.bm25TopK(posts, q, stats, k = 4).count() == 0)
    }
  }

  describe("Retrieval.writeIndex / readIndexSlice / bm25TopKIndexed") {
    it("the stored-df path equals the corpus-window path, and the " +
       "slice scan prunes on the term-bucket partition") {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-ridx").toString
      try {
        Retrieval.writeIndex(corpus, "doc_id", "text", tmp, nBuckets = 8)
        val q = Seq((1L, "joins"), (2L, "data"), (2L, "shuffle"))
          .toDF("query_id", "term")
        val stats = Retrieval.readStats(spark, tmp)
        val slice = Retrieval.readIndexSlice(
          spark, tmp, Seq("joins", "data", "shuffle"), nBuckets = 8)
        // partition pruning: the scan must carry a static tb filter
        val plan = slice.queryExecution.executedPlan.toString
        assert(plan.contains("PartitionFilters") && plan.contains("tb"),
          s"expected a tb partition filter in:\n$plan")
        val viaIndex = Retrieval.bm25TopKIndexed(slice, q, stats, k = 4)
          .as[(Long, Long, Long, Double)].collect().toSet
        val viaWindow = Retrieval.bm25TopK(
          Retrieval.postings(corpus, "doc_id", "text"), q,
          Retrieval.corpusStats(corpus, "text"), k = 4)
          .as[(Long, Long, Long, Double)].collect().toSet
        assert(viaIndex == viaWindow && viaIndex.nonEmpty)
      } finally graft.queries.Rm.rf(tmp)
    }

    it("an appended index serves identically to a fresh full build") {
      val half = java.nio.file.Files
        .createTempDirectory("graft-ridx-h").toString
      val full = java.nio.file.Files
        .createTempDirectory("graft-ridx-f").toString
      try {
        Retrieval.writeIndex(corpus.filter($"doc_id" < 2),
          "doc_id", "text", half, nBuckets = 8)
        Retrieval.appendIndex(corpus.filter($"doc_id" >= 2),
          "doc_id", "text", half, nBuckets = 8)
        Retrieval.writeIndex(corpus, "doc_id", "text", full, nBuckets = 8)
        // dictionary df must match exactly after the merge-swap
        def dict(d: String) = spark.read.parquet(s"$d/terms")
          .select("term", "df").as[(String, Long)].collect().toMap
        assert(dict(half) == dict(full))
        val q = Seq((1L, "joins"), (1L, "data")).toDF("query_id", "term")
        def serve(d: String) = Retrieval.bm25TopKIndexed(
          Retrieval.readIndexSlice(spark, d, Seq("joins", "data"), 8),
          q, Retrieval.readStats(spark, d), k = 4)
          .as[(Long, Long, Long, Double)].collect().toSet
        assert(serve(half) == serve(full) && serve(full).nonEmpty)
      } finally {
        graft.queries.Rm.rf(half); graft.queries.Rm.rf(full)
      }
    }
  }

  describe("Retrieval.booleanAnd") {
    it("agrees with a brute-force contains-all filter") {
      val posts = Retrieval.postings(corpus, "doc_id", "text")
      val terms = Seq("joins", "data")
      val got = Retrieval.booleanAnd(posts, terms)
        .as[(Long, Long)].collect().toMap
      val want = corpus.as[(Long, String)].collect()
        .filter { case (_, t) =>
          val toks = t.split(" "); terms.forall(toks.contains) }
        .map { case (id, t) =>
          id -> t.split(" ").count(terms.contains).toLong }
        .toMap
      assert(got == want)            // docs 0 (3 hits) and 1 (2 hits)
      assert(got == Map(0L -> 3L, 1L -> 2L))
    }
  }
}
