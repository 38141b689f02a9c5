package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark.spark
import graft.operators.Quantize

/** The native AdcTable kernel (round 16) must be BIT-identical to the
  * HOF fold it replaces — the w25/w27 oracles and the s11/s15 ADC
  * paths replay that exact `aggregate(zip_with(slice(qv), centroid,
  * sq), 0.0, +)` left fold — and the serve projection that round 15
  * proved could NOT hold m·k separate kernels (the HotSpot huge-method
  * JIT cliff) must now sit in whole-stage codegen as ONE call. */
class AdcTableSpec extends AnyFunSuite {
  import spark.implicits._

  private def cbGen: Gen[Seq[Seq[Seq[Double]]]] = for {
    m <- Gen.choose(1, 4)
    k <- Gen.choose(1, 5)
    d <- Gen.choose(1, 4)
    flat <- Gen.listOfN(m * k * d, Gen.oneOf(
      Gen.choose(-1.0, 1.0), Gen.choose(-1e150, 1e150),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue)))
  } yield flat.grouped(d).toSeq.grouped(k).toSeq
      .map(_.map(_.toSeq): Seq[Seq[Double]])

  private def tables(qv: Seq[java.lang.Double], cb: Seq[Seq[Seq[Double]]])
      : (Seq[Seq[java.lang.Double]], Seq[Seq[java.lang.Double]]) = {
    val row = Seq(Tuple1(qv)).toDF("qv")
      .select(
        Quantize.adcTableExpr(col("qv"), cb).as("native"),
        Quantize.adcTableExprHof(col("qv"), cb).as("hof"))
      .head()
    def get(i: Int): Seq[Seq[java.lang.Double]] =
      row.getSeq[scala.collection.Seq[java.lang.Double]](i)
        .map(_.toList).toList
    (get(0), get(1))
  }

  test("bit-identical to the HOF fold on random query vectors and " +
      "codebooks (denormals, huge magnitudes, NaN/Inf, short vectors, " +
      "null elements)") {
    val component = Gen.oneOf(
      Gen.choose(-1.0, 1.0).map(java.lang.Double.valueOf),
      Gen.choose(-1e150, 1e150).map(java.lang.Double.valueOf),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, Double.NaN,
        Double.PositiveInfinity).map(java.lang.Double.valueOf),
      Gen.const(null: java.lang.Double))
    val cases = for {
      cb <- cbGen
      full = cb.length * cb.head.head.length
      // sometimes SHORTER than m*d (the zip_with-pads-with-null edge)
      n <- Gen.oneOf(Gen.const(full), Gen.choose(0, full))
      qv <- Gen.listOfN(n, component)
    } yield (qv, cb)
    val prop = Prop.forAll(cases) { case (qv, cb) =>
      val (nat, hof) = tables(qv, cb)
      nat.length == hof.length && nat.zip(hof).forall { case (nr, hr) =>
        nr.length == hr.length && nr.zip(hr).forall {
          case (null, null) => true
          case (null, _) | (_, null) => false
          case (a, b) =>
            java.lang.Double.doubleToLongBits(a) ==
              java.lang.Double.doubleToLongBits(b)
        }
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(r.passed, r.status.toString)
  }

  test("documented NULL-qv divergence is invisible through the lookup: " +
      "native gives NULL table, HOF gives all-NULL rows, both read as " +
      "NULL adist") {
    val cb = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val row = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("qv")
      .select(
        Quantize.adcLookupExpr(
          Quantize.adcTableExpr(col("qv"), cb), array(lit(0)), 1).as("n"),
        Quantize.adcLookupExpr(
          Quantize.adcTableExprHof(col("qv"), cb), array(lit(0)), 1).as("h"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("float-element input fails analysis loudly (precision guard)") {
    val df = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("qv")
    val cb = Seq(Seq(Seq(1.0, 2.0)))
    val e = intercept[Exception] {
      df.select(Quantize.adcTableExpr(col("qv"), cb)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("adc_table"), e.getMessage)
  }

  test("the serve projection stays inside whole-stage codegen at the " +
      "probe's 8x16 codebook size (the round-15 JIT-cliff site)") {
    // the exact shape that cliffed: an 8x16x8 codebook = 128 entries
    // in one projection, plus the per-candidate lookup
    val cb = (0 until 8).map(mi => (0 until 16).map(j =>
      (0 until 8).map(i => (mi * 131 + j * 17 + i).toDouble / 7.0)
        : Seq[Double]))
    val df = spark.range(200).select(
      transform(sequence(lit(1), lit(64)),
        j => j.cast("double") / 64.0).as("qv"),
      transform(sequence(lit(1), lit(8)),
        j => pmod(j, lit(16)).cast("int")).as("codes"))
      .withColumn("adctab", Quantize.adcTableExpr(col("qv"), cb))
      .select(Quantize.adcLookupExpr(col("adctab"), col("codes"), 8).as("adist"))
      .filter(col("adist") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("zip_with"), plan)
    assert(!plan.contains("aggregate("), plan)
    // the generated code must actually compile and run (codegen path,
    // no fallback-to-interpreted on method-size grounds)
    assert(df.count() == 200)
  }
}
