package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark.spark

/** The native DotProduct expression (round 15) must be BIT-identical
  * to the higher-order-function form it replaced — every MaxSim and
  * cosine oracle in the catalog replays that exact left-fold — and
  * must reproduce the HOF chain's null semantics precisely. */
class VecExprSpec extends AnyFunSuite {
  import spark.implicits._

  /** The replaced form, verbatim. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v)

  private def bothDots(a: Seq[java.lang.Double],
                       b: Seq[java.lang.Double]): (Option[Double], Option[Double]) = {
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        graft.operators.Similarity.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .head()
    def get(i: Int): Option[Double] =
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    (get(0), get(1))
  }

  test("bit-identical to the HOF left fold on random vectors " +
      "(including denormals, huge magnitudes, and NaN/Inf)") {
    val component = Gen.oneOf(
      Gen.choose(-1.0, 1.0),
      Gen.choose(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
    val vecs = for {
      n <- Gen.choose(0, 32)
      a <- Gen.listOfN(n, component)
      b <- Gen.listOfN(n, component)
    } yield (a, b)
    val prop = Prop.forAll(vecs) { case (a, b) =>
      val (nat, hof) = bothDots(
        a.map(java.lang.Double.valueOf), b.map(java.lang.Double.valueOf))
      nat.isDefined == hof.isDefined &&
        nat.zip(hof).forall { case (n, h) =>
          java.lang.Double.doubleToLongBits(n) ==
            java.lang.Double.doubleToLongBits(h)
        }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("null semantics replicate the HOF chain: length mismatch and " +
      "null element both yield NULL; empty vectors yield 0.0") {
    val (n1, h1) = bothDots(
      Seq(1.0, 2.0).map(java.lang.Double.valueOf),
      Seq(3.0).map(java.lang.Double.valueOf))
    assert(n1.isEmpty && h1.isEmpty, "length mismatch must be NULL")
    val (n2, h2) = bothDots(
      Seq(java.lang.Double.valueOf(1.0), null),
      Seq(java.lang.Double.valueOf(3.0), java.lang.Double.valueOf(4.0)))
    assert(n2.isEmpty && h2.isEmpty, "null element must be NULL")
    val (n3, h3) = bothDots(Seq.empty, Seq.empty)
    assert(n3.contains(0.0) && h3.contains(0.0))
    // NULL array -> NULL (null-intolerant, like the HOF chain)
    val r = Seq((Seq(1.0, 2.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(graft.operators.Similarity.dot(col("a"), col("b")))
      .head()
    assert(r.isNullAt(0))
  }

  test("float-element input fails analysis loudly (precision guard)") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.operators.Similarity.dot(col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("vec_dot"), e.getMessage)
  }

  test("SqDist is bit-identical to its HOF form and shares the null " +
      "semantics (the k-means / PQ assignment kernel)") {
    def hofD2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t)
    val component = Gen.oneOf(Gen.choose(-1.0, 1.0),
      Gen.choose(-1e150, 1e150),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity))
    val vecs = for {
      n <- Gen.choose(0, 24)
      a <- Gen.listOfN(n, component)
      b <- Gen.listOfN(n, component)
    } yield (a, b)
    val prop = Prop.forAll(vecs) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          graft.operators.Quantize.dist2(col("a"), col("b")).as("nat"),
          hofD2(col("a"), col("b")).as("hof"))
        .head()
      row.isNullAt(0) == row.isNullAt(1) &&
        (row.isNullAt(0) ||
          java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
    // length mismatch and null element -> NULL, like the HOF chain
    val row = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(graft.operators.Quantize.dist2(col("a"), col("b")))
      .head()
    assert(row.isNullAt(0))
  }

  test("OverlapCount equals size(array_intersect) on random long " +
      "arrays, duplicates included (the SSJoin verify kernel)") {
    val arrays = for {
      m <- Gen.choose(0, 40)
      n <- Gen.choose(0, 40)
      // small value domain so collisions and duplicates are common
      a <- Gen.listOfN(m, Gen.choose(-20L, 20L))
      b <- Gen.listOfN(n, Gen.choose(-20L, 20L))
    } yield (a, b)
    val prop = Prop.forAll(arrays) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          org.apache.spark.sql.GraftBridge.column(
            graft.functions.OverlapCount(
              org.apache.spark.sql.GraftBridge.expression(col("a")),
              org.apache.spark.sql.GraftBridge.expression(col("b"))))
            .as("nat"),
          size(array_intersect(col("a"), col("b"))).cast("long")
            .as("builtin"))
        .head()
      row.getLong(0) == row.getLong(1)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("TokenVec is bit-identical to its HOF form on random terms " +
      "(the MaxSim vector-projection kernel, round 20)") {
    // ASCII, unicode (multi-byte UTF-8), empty, and whitespace terms:
    // the kernel hashes the raw UTF-8 bytes, so multi-byte code
    // points are where a byte-handling bug would surface.
    val term = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.listOfN(4, Gen.oneOf("é", "ß", "中", "🙂", "a", " "))
        .map(_.mkString),
      Gen.const(""))
    val cases = for {
      t <- term
      d <- Gen.choose(1, 16)
    } yield (t, d)
    val prop = Prop.forAll(cases) { case (t, d) =>
      val row = Seq(Tuple1(t)).toDF("t")
        .select(
          graft.operators.LateInteraction.tokenVec(col("t"), d).as("nat"),
          graft.operators.LateInteraction.tokenVecHof(col("t"), d)
            .as("hof"))
        .head()
      val nat = row.getSeq[Double](0)
      val hof = row.getSeq[Double](1)
      nat.size == hof.size && nat.zip(hof).forall { case (n, h) =>
        java.lang.Double.doubleToLongBits(n) ==
          java.lang.Double.doubleToLongBits(h)
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(r.passed, r.status.toString)
    // NULL term -> NULL array (null-intolerant unary expression)
    val nullRow = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(graft.operators.LateInteraction.tokenVec(col("t"), 4))
      .head()
    assert(nullRow.isNullAt(0))
    // and the projection site must stay inside whole-stage codegen
    val df = spark.range(50).select(
      graft.operators.LateInteraction
        .tokenVec(concat(lit("w"), col("id")), 8).as("v"))
      .select(element_at(col("v"), 1).as("x"))
      .filter(col("x") > -1.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("transform("), plan)
    assert(df.count() == 50)
  }

  test("the scoring site stays inside whole-stage codegen (no " +
      "CodegenFallback hole, no HOF in the plan)") {
    val df = spark.range(100).select(
      transform(sequence(lit(1), lit(8)),
        j => j.cast("double") / 10.0).as("a"),
      transform(sequence(lit(1), lit(8)),
        j => j.cast("double") / 7.0).as("b"))
      .select(graft.operators.Similarity.dot(col("a"), col("b")).as("d"))
      .filter(col("d") > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("zip_with"), plan)
    assert(!plan.contains("aggregate("), plan)
    // the generated code must actually compile and run (codegen path)
    assert(df.count() == 100)
  }
}
