package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class PHashSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Closed-form reference replicating the synthesis + dHash math. */
  private def refHash(id: Long): (Long, Long) = {
    def v(x: Int, y: Int): Int = {
      var b = (((x * 17 + y * 29) * (1 + id % 5)) % 256).toInt
      if (id % 11 == 0 && x == 0 && y == 0) b = (b + 128) % 256
      b
    }
    var hi = 0L; var lo = 0L
    for (y <- 0 until 8; x <- 0 until 8; if v(x + 1, y) > v(x, y)) {
      val idx = y * 8 + x
      if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
    }
    (hi, lo)
  }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  describe("PHash.dhash") {
    it("the decoded-pixel hash equals the closed form for every doc") {
      val ids = (0L until 25L).toDF("doc_id")
      val got = PHash.dhash(PHash.withPatternPng(ids, "doc_id"))
        .collect().map(d => d.doc_id -> (d.hi, d.lo)).toMap
      (0L until 25L).foreach { id => assert(got(id) == refHash(id), s"doc $id") }
    }
    it("halves are sign-free 32-bit values") {
      val got = PHash.dhash(PHash.withPatternPng(
        (0L until 25L).toDF("doc_id"), "doc_id")).collect()
      got.foreach { d =>
        assert(d.hi >= 0 && d.hi <= 0xffffffffL)
        assert(d.lo >= 0 && d.lo <= 0xffffffffL)
      }
    }
  }

  describe("PHash.nearDupPairs") {
    it("matches the brute-force Hamming join (lossless banding)") {
      val n = 40L
      val hashes = PHash.dhash(PHash.withPatternPng(
        (0L until n).toDF("doc_id"), "doc_id")).toDF()
      val got = PHash.nearDupPairs(hashes, maxDist = 3)
        .as[(Long, Long, Long)].collect().toSet
      val ref = (for {
        a <- 0L until n; b <- (a + 1) until n
        d = ham(refHash(a), refHash(b)) if d <= 3
      } yield (a, b, d.toLong)).toSet
      assert(got == ref)
      assert(ref.exists(_._3 == 1), "perturbation must plant distance-1 pairs")
      assert(ref.exists(_._3 == 0))
    }
  }
}
