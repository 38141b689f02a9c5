package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

/** MaxSim late interaction vs a driver-side brute-force replica of the
  * exact contract (hash features, rounded dots, decimal sums) and of
  * the sign-bucket pruning predicate. */
class LateInteractionSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 8

  /** Driver twin of Dedup.hash60: first 15 md5 hex chars as a long. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  private def vec(term: String): Array[Double] =
    (1 to Dim).map(j =>
      (hash60(s"${j}_$term") % 1000L).toDouble / 1000.0 - 0.5).toArray

  private def dot9(a: Array[Double], b: Array[Double]): Double = {
    val raw = a.zip(b).map { case (x, y) => x * y }
      .foldLeft(0.0)(_ + _)
    BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  private def bucket(v: Array[Double], bits: Int): Long =
    (0 until bits).map(i => if (v(i) > 0.0) 1L << i else 0L).sum

  /** Brute MaxSim over an optional pair filter (None = exact;
    * Some(pred) = only (qv, dv) pairs passing pred are scored). */
  private def brute(docs: Seq[(Long, String)],
                    queries: Seq[(Long, Seq[String])], k: Int,
                    keep: Option[(Array[Double], Array[Double]) => Boolean])
      : Seq[(Long, Long, Long, Double)] =
    queries.flatMap { case (qid, terms) =>
      val qts = terms.distinct.map(t => t -> vec(t))
      docs.flatMap { case (did, text) =>
        val dts = text.split(" ").filter(_.nonEmpty).distinct.map(vec)
        val maxima = qts.flatMap { case (_, qv) =>
          val cand = dts.filter(dv =>
            keep.forall(p => p(qv, dv))).map(dv => dot9(qv, dv))
          if (cand.isEmpty) None else Some(cand.max)
        }
        if (maxima.isEmpty) None
        else {
          val s = maxima
            .map(BigDecimal(_).setScale(9, BigDecimal.RoundingMode.HALF_UP))
            .sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((qid, did, s))
        }
      }.sortBy { case (_, did, s) => (-s, did) }
        .take(k).zipWithIndex
        .map { case ((q, d, s), i) => (q, (i + 1).toLong, d, s) }
    }

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until 40L).map { id =>
      val n = 3 + rnd.nextInt(10)
      (id, Seq.fill(n)(s"t${rnd.nextInt(25)}").mkString(" "))
    }
  }

  private val queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("t1", "t7"), 2L -> Seq("t3", "t3", "t12", "t24"),
    3L -> Seq("zzz_absent", "t5"))

  describe("LateInteraction.maxSimTopK") {
    it("matches the brute-force MaxSim (rounded dots, decimal sums, " +
        "doc_id tie-break) on random corpora, duplicate query tokens " +
        "and absent-term queries included") {
      for (seed <- 1 to 3) {
        val docs = corpus(seed)
        val got = LateInteraction.maxSimTopK(
            docs.toDF("doc_id", "text"), "doc_id", "text",
            queries.toDF("query_id", "terms"), dim = Dim, k = 5)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val want = brute(docs, queries, k = 5, keep = None)
          .toList.sorted
        assert(got == want && got.nonEmpty, s"seed $seed diverged")
      }
    }
  }

  describe("LateInteraction.maxSimTopKFromMap") {
    it("serving from the cached doc-token map is bit-identical to " +
        "the direct exact path (duplicate-token pre-collapse is " +
        "invisible in results)") {
      for (seed <- 1 to 2) {
        val docs = corpus(seed + 20)
        val df = docs.toDF("doc_id", "text")
        val qs = queries.toDF("query_id", "terms")
        val direct = LateInteraction
          .maxSimTopK(df, "doc_id", "text", qs, dim = Dim, k = 5)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val tokMap = LateInteraction
          .docTokenMap(df, "doc_id", "text", dim = Dim)
        val served = LateInteraction
          .maxSimTopKFromMap(tokMap, qs, dim = Dim, k = 5)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        assert(served == direct && served.nonEmpty,
          s"seed $seed diverged")
      }
    }
  }

  describe("LateInteraction.maxSimTopKVectors") {
    it("scores arbitrary multi-vector relations by hand-checkable " +
        "MaxSim (inner max per query vector, decimal sum, doc_id " +
        "tie-break)") {
      // doc 0: unit x + unit y; doc 1: unit x only; query 7: {x, y}
      val docVecs = Seq(
        (0L, Array(1.0, 0.0)), (0L, Array(0.0, 1.0)),
        (1L, Array(1.0, 0.0)), (1L, Array(0.6, 0.0)))
        .toDF("doc_id", "dv")
      val qVecs = Seq(
        (7L, 0, Array(1.0, 0.0)), (7L, 1, Array(0.0, 1.0)))
        .toDF("query_id", "qidx", "qv")
      val got = LateInteraction.maxSimTopKVectors(docVecs, qVecs, k = 5)
        .as[(Long, Long, Long, Double)].collect().toList
      // doc 0: max(x·x)=1 + max(y·y)=1 = 2; doc 1: 1 + 0 = 1
      assert(got == List((7L, 1L, 0L, 2.0), (7L, 2L, 1L, 1.0)))
    }
  }

  describe("LateInteraction.maxSimTopKPruned") {
    it("equals the brute-force replica of the Hamming<=1 sign-bucket " +
        "pruning predicate (the probe-set equi-join loses and gains " +
        "nothing vs the predicate form)") {
      val bits = 4   // small bucket space → collisions AND misses both occur
      for (seed <- 1 to 3) {
        val docs = corpus(seed + 10)
        val got = LateInteraction.maxSimTopKPruned(
            docs.toDF("doc_id", "text"), "doc_id", "text",
            queries.toDF("query_id", "terms"), dim = Dim, k = 5,
            bits = bits)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val want = brute(docs, queries, k = 5,
          keep = Some((qv, dv) => java.lang.Long.bitCount(
            bucket(qv, bits) ^ bucket(dv, bits)) <= 1)).toList.sorted
        assert(got == want && got.nonEmpty, s"seed $seed diverged")
        // the pruning is non-trivial on this corpus: some pair was cut
        val exact = brute(docs, queries, k = 5, keep = None)
        assert(exact != want, s"seed $seed: pruning was a no-op")
      }
    }
  }

  /** Brute replica of the PLAID two-stage serve: top-`c` docs per
    * query by the Hamming-`h` pruned scorer NOMINATE, exact MaxSim
    * re-scores the nominated docs only. */
  private def brutePlaid(docs: Seq[(Long, String)],
                         queries: Seq[(Long, Seq[String])], k: Int,
                         bits: Int, c: Int, h: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val nominated = brute(docs, queries, k = c,
      keep = Some((qv, dv) => java.lang.Long.bitCount(
        bucket(qv, bits) ^ bucket(dv, bits)) <= h))
      .map { case (q, _, d, _) => (q, d) }.toSet
    queries.flatMap { case (qid, terms) =>
      val kept = docs.filter(d => nominated.contains((qid, d._1)))
      brute(kept, Seq(qid -> terms), k = k, keep = None)
    }
  }

  describe("LateInteraction.maxSimTopKPlaid") {
    it("equals the brute nomination→exact-rerank replica, and a " +
        "full-depth nomination degrades to the exact ranking") {
      val bits = 4
      for (seed <- 1 to 3) {
        val docs = corpus(seed + 30)
        val df = docs.toDF("doc_id", "text")
        val qs = queries.toDF("query_id", "terms")
        val got = LateInteraction.maxSimTopKPlaid(
            df, "doc_id", "text", qs, dim = Dim, k = 5,
            bits = bits, c = 8, hamming = 1)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val want = brutePlaid(docs, queries, k = 5, bits = bits,
          c = 8, h = 1).toList.sorted
        assert(got == want && got.nonEmpty, s"seed $seed diverged")
        // c >= |docs| nominates everything -> the rerank IS exact
        val full = LateInteraction.maxSimTopKPlaid(
            df, "doc_id", "text", qs, dim = Dim, k = 5,
            bits = bits, c = docs.size, hamming = bits)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val exact = brute(docs, queries, k = 5, keep = None)
          .toList.sorted
        assert(full == exact, s"seed $seed: full-depth != exact")
      }
    }
  }

  describe("LateInteraction.maxSimTopKPlaidFromMap") {
    it("serving from the cached doc-token map is bit-identical to " +
        "the direct PLAID path") {
      for (seed <- 1 to 2) {
        val docs = corpus(seed + 40)
        val df = docs.toDF("doc_id", "text")
        val qs = queries.toDF("query_id", "terms")
        val direct = LateInteraction.maxSimTopKPlaid(
            df, "doc_id", "text", qs, dim = Dim, k = 5,
            bits = 4, c = 8, hamming = 2)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        val tokMap = LateInteraction
          .docTokenMap(df, "doc_id", "text", dim = Dim)
        val served = LateInteraction.maxSimTopKPlaidFromMap(
            tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8,
            hamming = 2)
          .as[(Long, Long, Long, Double)].collect().toList.sorted
        assert(served == direct && served.nonEmpty,
          s"seed $seed diverged")
      }
    }
  }

  describe("LateInteraction.maxSimTopKPlaidFromMapCapped") {
    it("chunked serving above the per-plan cap is bit-identical to " +
        "the uncapped serve (batch composition cannot change any " +
        "query's answer) and delegates through at or under the cap") {
      val df = corpus(80).toDF("doc_id", "text")
      val qs = queries.toDF("query_id", "terms")
      val tokMap = LateInteraction
        .docTokenMap(df, "doc_id", "text", dim = Dim)
      val uncapped = LateInteraction.maxSimTopKPlaidFromMap(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      // cap of 1 forces ceil(n/1) = n chunks — the maximal split
      val capped = LateInteraction.maxSimTopKPlaidFromMapCapped(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
          maxQueriesPerPlan = 1)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      assert(capped == uncapped && uncapped.nonEmpty)
      val passthrough = LateInteraction.maxSimTopKPlaidFromMapCapped(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
          maxQueriesPerPlan = Int.MaxValue)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      assert(passthrough == uncapped)
    }

    it("PIPELINED chunk submission (chunkParallelism > 1) is " +
       "bit-identical to the sequential chunked serve — the pool " +
       "changes job overlap, never content (r18 verdict #4)") {
      val df = corpus(80).toDF("doc_id", "text")
      val qs = queries.toDF("query_id", "terms")
      val tokMap = LateInteraction
        .docTokenMap(df, "doc_id", "text", dim = Dim)
      val sequential = LateInteraction.maxSimTopKPlaidFromMapCapped(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
          maxQueriesPerPlan = 1)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      val pipelined = LateInteraction.maxSimTopKPlaidFromMapCapped(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
          maxQueriesPerPlan = 1, chunkParallelism = 3)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      assert(pipelined == sequential && sequential.nonEmpty)
    }
  }

  describe("LateInteraction.maxSimServeFromMapPlan") {
    it("picks the exact arm below the row crossover and the plaid " +
        "arm above it, each bit-identical to the named arm (VERDICT " +
        "r16 #1 — both regimes exercised via the crossover " +
        "parameter, since spec corpora are all 'small')") {
      val df = corpus(60).toDF("doc_id", "text")
      val qs = queries.toDF("query_id", "terms")
      val tokMap = LateInteraction
        .docTokenMap(df, "doc_id", "text", dim = Dim)
      val nRows = tokMap.count()
      assert(nRows > 1)
      // small-corpus regime: map fits under the crossover → exact
      val (armLo, resLo) = LateInteraction.maxSimServeFromMapPlan(
        tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
        crossoverRows = nRows)
      assert(armLo == "exact")
      val exact = LateInteraction
        .maxSimTopKFromMap(tokMap, qs, dim = Dim, k = 5)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      assert(resLo.as[(Long, Long, Long, Double)]
        .collect().toList.sorted == exact && exact.nonEmpty)
      // large-corpus regime: crossover below the map size → plaid
      val (armHi, resHi) = LateInteraction.maxSimServeFromMapPlan(
        tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2,
        crossoverRows = nRows - 1)
      assert(armHi == "plaid")
      val plaid = LateInteraction.maxSimTopKPlaidFromMap(
          tokMap, qs, dim = Dim, k = 5, bits = 4, c = 8, hamming = 2)
        .as[(Long, Long, Long, Double)].collect().toList.sorted
      assert(resHi.as[(Long, Long, Long, Double)]
        .collect().toList.sorted == plaid && plaid.nonEmpty)
    }
  }
}
