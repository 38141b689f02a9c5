package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class LinAlgSpec extends AnyFunSuite {
  import spark.implicits._

  private def vecs(rows: Seq[Seq[Float]]) =
    rows.map(Tuple1(_)).toDF("embedding")

  test("gramQFast equals gramQ exactly (integer sums have one answer)") {
    val dim = 5
    val rows = (1 to 40).map(r =>
      (0 until dim).map(i => ((r * 31 + i * 17) % 13 - 6) / 7.0f))
    val df = vecs(rows)
    val slow = LinAlg.gramQ(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fast = LinAlg.gramQFast(df, "embedding", dim)
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      assert(fast(k) == slow((i, j)), s"slot ($i,$j)")
      k += 1
    }
    assert(k == fast.length)
  }

  test("topEigenQ recovers a planted dominant direction") {
    // variance overwhelmingly along axis 2 → eigenvector concentrates
    // there; sign follows the all-ones start (positive loading)
    val dim = 4
    val rows = (1 to 50).map { r =>
      val s = if (r % 2 == 0) 1.0f else -1.0f
      Seq(0.01f * (r % 3), 0.02f * (r % 5), s * 0.9f, 0.01f)
    }
    val upper = LinAlg.gramQ(vecs(rows), "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val v = LinAlg.topEigenQ(upper, dim)
    assert(math.abs(v(2)) == v.map(math.abs).max)
    assert(math.abs(v(2)) > 10 * math.abs(v(0)))
    assert(math.abs(v(2)) > 10 * math.abs(v(1)))
  }

  test("projectQ is the exact quantized dot product") {
    val df = Seq((1L, Seq(0.5f, -0.25f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val v = Array(2000000L, 1000000L)
    val got = LinAlg.projectQ(df, "vec_id", "embedding", v)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    // q(0.5)=500000, q(-0.25)=-250000; proj1 = 5e5·2e6 + (−25e4)·1e6
    assert(got == Seq(
      (1L, 500000L * 2000000L - 250000L * 1000000L),
      (2L, 1000000L * 2000000L + 1000000L * 1000000L)))
  }

  test("topEigenQ overflow guard fails loudly") {
    val upper = Seq((0, 0, Long.MaxValue), (0, 1, 0L), (1, 1, 1L))
    val e = intercept[IllegalArgumentException] {
      LinAlg.topEigenQ(upper, 2)
    }
    assert(e.getMessage.contains("overflow"))
  }
}
