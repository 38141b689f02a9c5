package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.catalyst.util.ArrayData

import graft.TestSpark.spark

/** The sorted set kernels behind the SSJoin verify (round 16): the
  * PPJoin+ suffix partition bound must NEVER undercut the true
  * distinct overlap (an undercut would prune a qualifying pair —
  * silent result loss), and the presorted overlap merge must equal
  * the sort-per-pair kernel it replaced. */
class SetExprSpec extends AnyFunSuite {
  import spark.implicits._

  private def arr(xs: Seq[Long]): ArrayData =
    ArrayData.toArrayData(xs.toArray)

  /** Sorted long arrays with heavy duplication (small value domain)
    * so the == v band and run-skipping paths are exercised. */
  private val sortedPair = for {
    m <- Gen.choose(0, 60)
    n <- Gen.choose(0, 60)
    a <- Gen.listOfN(m, Gen.choose(-25L, 25L))
    b <- Gen.listOfN(n, Gen.choose(-25L, 25L))
  } yield (a.sorted, b.sorted)

  test("suffixBound is a sound upper bound on the distinct overlap, " +
      "<= min(sizes), and monotonically tighter in depth") {
    val prop = Prop.forAll(sortedPair) { case (a, b) =>
      val exact = SetKernels.overlapCount(arr(a), arr(b))
      val bounds = (0 to 6).map(d =>
        SetKernels.suffixBound(arr(a), arr(b), d))
      bounds.forall(_ >= exact) &&
        bounds.head == math.min(a.size, b.size).toLong &&
        bounds.sliding(2).forall {
          case Seq(x, y) => y <= x
          case _ => true
        }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("suffixBound is exact on identical and on disjoint arrays at " +
      "depth >= 1") {
    val xs = Seq(1L, 3L, 3L, 7L, 9L)
    assert(SetKernels.suffixBound(arr(xs), arr(xs), 3) >=
      SetKernels.overlapCount(arr(xs), arr(xs)))
    // fully disjoint value ranges: depth 1 still carries a min() leaf
    // (the > pivot residue), depth 3 resolves every leaf to empty
    val lo = Seq(1L, 2L, 3L)
    val hi = Seq(100L, 101L)
    assert(SetKernels.suffixBound(arr(lo), arr(hi), 1) == 1L)
    assert(SetKernels.suffixBound(arr(lo), arr(hi), 3) == 0L)
    assert(SetKernels.suffixBound(arr(lo), arr(Seq.empty[Long]), 0) == 0L)
  }

  test("overlapCountSorted equals overlapCount on sorted arrays, " +
      "duplicates included") {
    val prop = Prop.forAll(sortedPair) { case (a, b) =>
      SetKernels.overlapCountSorted(arr(a), arr(b)) ==
        SetKernels.overlapCount(arr(a), arr(b))
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("overlapCountSorted loudly rejects unsorted input and null " +
      "elements (never a silently-wrong count)") {
    intercept[IllegalArgumentException] {
      SetKernels.overlapCountSorted(arr(Seq(3L, 1L)), arr(Seq(1L)))
    }
    intercept[IllegalArgumentException] {
      SetKernels.overlapCountSorted(arr(Seq(1L)), arr(Seq(9L, 2L)))
    }
    intercept[IllegalArgumentException] {
      SetKernels.overlapCountSorted(
        ArrayData.toArrayData(Array[java.lang.Long](1L, null, 3L)),
        arr(Seq(1L)))
    }
  }

  test("SuffixBound + SortedOverlapCount run on the codegen path " +
      "(no CodegenFallback hole) and match the built-ins") {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val df = Seq(
        (Seq(1L, 2L, 3L, 9L), Seq(2L, 3L, 4L)),
        (Seq(-5L, 0L, 8L), Seq(8L, 9L)),
        (Seq.empty[Long], Seq(1L)))
      .toDF("a", "b")
      .select(
        column(graft.functions.SuffixBound(
          expression(col("a")), expression(col("b")), 3)).as("bound"),
        column(graft.functions.SortedOverlapCount(
          expression(col("a")), expression(col("b")))).as("ov"),
        size(array_intersect(col("a"), col("b"))).cast("long")
          .as("builtin"))
      .filter(col("bound") >= col("ov"))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = df.collect()
      assert(rows.length == 3)
      assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
      assert(rows.forall(r => r.getLong(0) >= r.getLong(1)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("the SSJoin suffix filter is a real cut that loses nothing: " +
      "true pairs <= suffix survivors < positional candidates on a " +
      "mixed near-dup/noise corpus") {
    import graft.operators.SSJoin
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 60).map(i => s"w$i")
    // noise docs share a FEW tokens (prefix collisions without high
    // Jaccard) + planted near-dup pairs that must all survive
    val noise = (0L until 60L).map { i =>
      (i, rnd.shuffle(vocab).take(10 + rnd.nextInt(8)).mkString(" "))
    }
    val planted = noise.take(15).map { case (i, txt) =>
      (i + 1000L, txt + s" extra$i")
    }
    val docs = (noise ++ planted).toDF("doc_id", "text")
    val t = 0.8
    val sorted = SSJoin.sortedTokenArrays(docs, "doc_id", "text")
    val cands = SSJoin.candidates(SSJoin.prefixRows(sorted, t), t)
      .localCheckpoint()
    val nCands = cands.count()
    val nSuffix = SSJoin.suffixFiltered(sorted, cands, t).count()
    val nTrue = SSJoin.join(docs, "doc_id", "text", t).count()
    assert(nTrue >= 15, s"planted pairs missing: $nTrue")
    assert(nSuffix >= nTrue,
      s"suffix filter lost pairs: $nSuffix < $nTrue")
    assert(nSuffix < nCands,
      s"suffix filter was a no-op: $nSuffix of $nCands")
  }
}
