package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class RangeJoinSpec extends AnyFunSpec {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("RangeJoin.pointInInterval") {
    it("is lossless vs the bare theta join on random data — " +
        "boundary-inclusive ends, spans longer than the bin width, " +
        "empty intervals and negative values included") {
      for (seed <- 1 to 3) {
        val rnd = new scala.util.Random(seed)
        val pts = (0 until 400)
          .map(i => (i.toLong, rnd.nextInt(2000).toLong - 1000L))
        val ivs = (0 until 60).map { k =>
          val lo = rnd.nextInt(2000).toLong - 1000L
          // spans 0..120 — some cross several width-31 bins
          (k.toLong, lo, lo + rnd.nextInt(121))
        }
        val p = pts.toDF("pid", "v")
        val i = ivs.toDF("ik", "lo", "hi")
        val got = RangeJoin.pointInInterval(p, "v", i, "lo", "hi",
            width = 31)
          .select("pid", "ik").as[(Long, Long)].collect().toSet
        val want = p.join(i,
            col("v") >= col("lo") && col("v") <= col("hi"))
          .select("pid", "ik").as[(Long, Long)].collect().toSet
        assert(got == want && want.nonEmpty, s"seed $seed diverged")
        // each qualifying pair appears exactly once (one bin match)
        val rows = RangeJoin.pointInInterval(p, "v", i, "lo", "hi",
          width = 31).count()
        assert(rows == want.size, s"seed $seed duplicated pairs")
      }
    }

    it("boundary points match inclusively at both ends across a bin " +
        "edge") {
      val p = Seq((1L, 30L), (2L, 31L), (3L, 62L), (4L, 63L))
        .toDF("pid", "v")
      val i = Seq((9L, 31L, 62L)).toDF("ik", "lo", "hi")
      val got = RangeJoin.pointInInterval(p, "v", i, "lo", "hi",
          width = 31)
        .select("pid").as[Long].collect().toSet
      assert(got == Set(2L, 3L))
    }
  }
}
