package graft.operators

import org.apache.spark.sql.functions.{abs, levenshtein}
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class MiningSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("Colloc") {
    // "x y" always co-occur; "p"/"q" never adjacent to each other.
    val docs = Seq(
      (0L, "x y p x y q"),
      (1L, "q x y p"),
      (2L, "p q x y"))
      .toDF("doc_id", "text")

    it("counts adjacent bigrams exactly") {
      val bc = Colloc.bigramCounts(docs, "text")
        .as[(String, String, Long)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      assert(bc.getOrElse(("x", "y"), 0L) == 4L)
      assert(bc.getOrElse(("y", "p"), 0L) == 2L)
      assert(!bc.contains(("p", "q")) || bc(("p", "q")) == 1L)
    }

    it("ranks the perfect collocation first, with a hand-checked PMI") {
      val top = Colloc.pmiTopK(
        Colloc.bigramCounts(docs, "text"),
        Colloc.unigramCounts(docs, "text"),
        minCount = 2, k = 5)
        .as[(String, String, Long, Double)].collect().toList
      assert(top.head._1 == "x" && top.head._2 == "y")
      // c_xy=4, NB=11, c_x=4, c_y=4, NT=14 →
      // pmi = ln(4·14·14 / (11·4·4))
      val want = BigDecimal(
        math.log((4.0 * 14 * 14) / (11.0 * 4 * 4)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(top.head._4 == want)
    }
  }

  describe("EntityRes.fsScorePairs") {
    val recs = Seq(
      (1L, 1, "ann smith", 10.0),
      (2L, 1, "ann smyth", 10.005),   // levenshtein 1, close balance
      (3L, 1, "bob jones", 500.0),    // same block, agrees on nothing
      (4L, 2, "ann smith", 10.0))     // exact dup of 1 but OTHER block
      .toDF("id", "blk", "name", "bal")

    def run = EntityRes.fsScorePairs(recs, "id", Seq("blk"), Seq(
      FsField("name", (a, b) => levenshtein(a, b) <= 1, m = 0.9, u = 0.01),
      FsField("bal", (a, b) => abs(a - b) <= 0.02, m = 0.9, u = 0.01)))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    it("scores agreements ln(m/u) and disagreements ln((1-m)/(1-u))") {
      val wAgree = math.log(0.9 / 0.01)
      val wDis = math.log((1.0 - 0.9) / (1.0 - 0.01))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(run((1L, 2L)) == (2L, r6(wAgree + wAgree)))
      assert(run((1L, 3L)) == (0L, r6(wDis + wDis)))
    }
    it("never compares across blocks (blocking recall is explicit)") {
      assert(!run.contains((1L, 4L)) && !run.contains((2L, 4L)))
      assert(run.size == 3)   // pairs (1,2),(1,3),(2,3) inside block 1
    }
  }

  describe("Winnow") {
    // doc 1 = doc 0 with an edit at the FRONT; the shared tail's
    // fingerprints must survive (the winnowing robustness property)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "EDIT alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")

    def fps = Winnow.fingerprints(
      Winnow.gramOccurrencesMd5(docs, "doc_id", "text", n = 3), w = 3)

    it("selects one fingerprint per window (density guarantee) and " +
       "an edited copy keeps the shared region's fingerprints") {
      val byDoc = fps.as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // doc 0: 8 grams, 6 full windows → between 1 and 6 distinct mins
      assert(byDoc(0L).nonEmpty && byDoc(0L).size <= 6)
      // every fingerprint of doc 0 except those near the edit site
      // must also be selected for doc 1
      assert((byDoc(0L) intersect byDoc(1L)).size >= byDoc(0L).size - 2)
      assert((byDoc(0L) intersect byDoc(2L)).isEmpty)
    }

    it("pairs docs by shared fingerprints with the df cap honored") {
      val pairs = Winnow.sharedFingerprintPairs(fps, minShared = 2,
        maxFpDf = 10).as[(Long, Long, Long)].collect()
      assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
      // a df cap of 1 kills every shared fingerprint → no pairs
      assert(Winnow.sharedFingerprintPairs(fps, 1, maxFpDf = 1).count() == 0)
    }
  }

  describe("SpanDedup") {
    // doc 0 and 1 share the exact 10-gram "a b c d e f g h i j";
    // doc 2 shares nothing.
    val docs = Seq(
      (0L, "a b c d e f g h i j zz"),
      (1L, "yy a b c d e f g h i j"),
      (2L, "k l m n o p q r s t u"))
      .toDF("doc_id", "text")

    it("emits one occurrence per position with the position 0-based") {
      val occ = SpanDedup.gramOccurrences(docs, "doc_id", "text", n = 10)
        .as[(Long, Int, Long)].collect()
      assert(occ.count(_._1 == 0L) == 2)       // positions 0 and 1
      assert(occ.filter(_._1 == 2L).map(_._2).sorted.toList == List(0, 1))
    }

    it("masks exactly the shared span's union, not the whole doc") {
      val got = SpanDedup.repeatedSpanStats(
        SpanDedup.gramOccurrences(docs, "doc_id", "text", n = 10), n = 10)
        .as[(Long, Long, Long)].collect()
        .map { case (id, o, m) => id -> (o, m) }.toMap
      // doc 0: shared gram at pos 0 → 1 occurrence, tokens 0..9 masked
      // doc 1: shared gram at pos 1 → 1 occurrence, tokens 1..10 masked
      assert(got == Map(0L -> (1L, 10L), 1L -> (1L, 10L)))
    }
  }
}
