package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class FuzzySpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Lengths straddle several floor(len/5) buckets: 3,4 (b0), 6,8 (b1),
  // 10,12 (b2), 18 (b3) — same-bucket, adjacent-bucket, and
  // out-of-band pairs all occur.
  private lazy val docs = Seq(
    (0L, "abc"),                  // len 3
    (1L, "abcd"),                 // len 4
    (2L, "abcdxy"),               // len 6
    (3L, "abcdwxyz"),             // len 8
    (4L, "abcdwxyz01"),           // len 10
    (5L, "abcdwxyz0123"),         // len 12
    (6L, "abcdwxyz0123456789"))   // len 18
    .toDF("doc_id", "text")

  private def brute(maxDelta: Int, minSim: Double) = {
    val d = docs.select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("n"))
    val a = d.select(col("doc_id").as("doc_a"), col("text").as("ta"),
      col("n").as("na"))
    val b = d.select(col("doc_id").as("doc_b"), col("text").as("tb"),
      col("n").as("nb"))
    a.join(b, col("doc_a") < col("doc_b") &&
        abs(col("na") - col("nb")) <= maxDelta)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("lev"),
        round(lit(1.0) -
          levenshtein(col("ta"), col("tb")).cast("double") /
            greatest(col("na"), col("nb")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  describe("Fuzzy.blockedLevPairs") {
    it("is lossless vs the unblocked theta join (minSim=0 keeps " +
        "every in-band pair)") {
      val got = Fuzzy.blockedLevPairs(docs, "doc_id", "text",
          maxDeltaLen = 5, minSim = 0.0)
        .as[(Long, Long, Long, Double)].collect().toSet
      val want = brute(5, 0.0)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == want)
      // sanity: the band is non-trivial — some pairs in, some out
      assert(want.nonEmpty && want.size <
        docs.count() * (docs.count() - 1) / 2)
    }

    it("emits each pair exactly once (no same/adjacent-arm overlap)") {
      val keys = Fuzzy.blockedLevPairs(docs, "doc_id", "text",
          maxDeltaLen = 5, minSim = 0.0)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      assert(keys.length == keys.toSet.size)
      assert(keys.forall { case (a, b) => a < b })
    }

    it("keeps Δlen == maxDeltaLen and drops Δlen == maxDeltaLen + 1 " +
        "even across a bucket boundary") {
      // len 4 vs 9: Δ=5, buckets 0 and 1 — adjacent, must be kept
      // len 4 vs 10: Δ=6 — out of band
      val two = Seq((0L, "aaaa"), (1L, "aaaabbbbb"), (2L, "aaaabbbbbb"))
        .toDF("doc_id", "text")
      val pairs = Fuzzy.blockedLevPairs(two, "doc_id", "text",
          maxDeltaLen = 5, minSim = 0.0)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 1L)))
      assert(!pairs.contains((0L, 2L)))
      assert(pairs.contains((1L, 2L))) // Δ=1, same bucket (1)
    }

    it("two empty texts score sim=1 (identical pair) instead of " +
        "being dropped by a 0/0 null") {
      val d = Seq((0L, ""), (1L, ""), (2L, "xyz"))
        .toDF("doc_id", "text")
      val got = Fuzzy.blockedLevPairs(d, "doc_id", "text",
          maxDeltaLen = 5, minSim = 0.9)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == Set((0L, 1L, 0L, 1.0)))
    }

    it("respects the similarity threshold") {
      val got = Fuzzy.blockedLevPairs(docs, "doc_id", "text",
          maxDeltaLen = 5, minSim = 0.6)
        .as[(Long, Long, Long, Double)].collect()
      assert(got.nonEmpty)
      assert(got.forall(_._4 >= 0.6))
      val want = brute(5, 0.6)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got.toSet == want)
    }
  }

  describe("d100_pipeline_funnel plan") {
    it("executes with exactly ONE FileScan over documents and one " +
        "dedup window (the round-10 union form scanned 5x)") {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-funnel-plan").toString
      try {
        // enough rows that every stage is non-trivial: dupes, short
        // docs, and a long doc for multi-chunking
        val filler = Array.fill(30)("the quick brown fox of it")
          .mkString(" ")
        Seq(
          (1L, s"a $filler"),
          (2L, s"a $filler"),                 // exact dupe of 1
          (3L, s"b $filler"),
          (4L, "too short"),                  // fails length gate
          (5L, "x y z " * 20)                 // no stopwords → quality
        ).toDF("doc_id", "text")
          .write.mode("overwrite")
          .parquet(s"$tmp/documents.parquet")
        val df = graft.SparkEntry
          .queries("d100_pipeline_funnel")(spark, tmp)
        val rows = df.collect().map(r =>
          r.getString(1) -> r.getLong(2)).toMap
        assert(rows("raw") == 5L)
        assert(rows("exact_dedup") == rows("quality") - 1)
        val plan = df.queryExecution.executedPlan.toString
        // AQE prints the plan twice (Final + Initial) once executed;
        // each copy must contain exactly one scan and one window
        val scans = "FileScan parquet".r.findAllIn(plan).size
        val windows = "\\bWindow \\[row_number".r.findAllIn(plan).size
        assert(scans == windows && (scans == 1 || scans == 2),
          s"scans=$scans windows=$windows\n$plan")
      } finally graft.queries.Rm.rf(tmp)
    }
  }
}
