package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-level kernel behind [[OverlapCount]], shared by the
  * interpreted and codegen paths. */
object SetKernels {

  /** `|distinct(a) ∩ distinct(b)|` over two LONG arrays: copy + sort
    * both sides, then one duplicate-skipping two-pointer merge —
    * exactly `size(array_intersect(a, b))`'s value without
    * materializing the intersection array (and without the per-pair
    * hash-set build). O((m+n)·log) on two primitive arrays; the
    * verify-side arrays this serves are tens of elements.
    *
    * NULL ELEMENTS are a loud error, not a silent semantic: the one
    * call site (SSJoin's verify) builds its arrays from non-null
    * hashes, and `array_intersect`'s null-bearing behavior is not
    * replicated here. */
  def overlapCount(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    val xs = new Array[Long](m)
    val ys = new Array[Long](n)
    var i = 0
    while (i < m) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          "overlap_count: NULL array element (the kernel serves " +
            "null-free hash arrays; use array_intersect for " +
            "null-bearing inputs)")
      xs(i) = a.getLong(i); i += 1
    }
    i = 0
    while (i < n) {
      if (b.isNullAt(i))
        throw new IllegalArgumentException(
          "overlap_count: NULL array element (the kernel serves " +
            "null-free hash arrays; use array_intersect for " +
            "null-bearing inputs)")
      ys(i) = b.getLong(i); i += 1
    }
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var cnt = 0L
    var p = 0
    var q = 0
    while (p < m && q < n) {
      val x = xs(p)
      val y = ys(q)
      if (x == y) {
        cnt += 1
        // skip the whole run of this value on BOTH sides — distinct
        // semantics regardless of input duplicates
        while (p < m && xs(p) == x) p += 1
        while (q < n && ys(q) == y) q += 1
      } else if (x < y) p += 1
      else q += 1
    }
    cnt
  }

  /** One O(n) pre-scan: every element non-null and ascending-sorted.
    * Loud error either way — the sorted kernels below would return a
    * silently-wrong count on unsorted input, and that class of defect
    * must never be quiet (the overlapCount null rule, extended). */
  private def checkSortedNonNull(a: ArrayData, side: String): Unit = {
    val n = a.numElements()
    var i = 0
    var prev = Long.MinValue
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"sorted set kernel: NULL element in $side array (the " +
            "kernels serve null-free hash arrays)")
      val v = a.getLong(i)
      if (v < prev)
        throw new IllegalArgumentException(
          s"sorted set kernel: $side array is not ascending-sorted " +
            s"at index $i (${v} < ${prev}) — sort_array the input")
      prev = v
      i += 1
    }
  }

  /** [[overlapCount]] for inputs ALREADY ascending-sorted (e.g. via
    * `sort_array`): one duplicate-skipping two-pointer merge directly
    * over the `ArrayData` — no per-pair copy, no per-pair
    * `Arrays.sort`. The call site that serves candidate-pair volume
    * (SSJoin's verify) sorts each doc's array ONCE and amortizes it
    * across every pair the doc participates in; this kernel is the
    * per-pair remainder. Sortedness and non-nullness are pre-scanned
    * (O(m+n), branch-cheap, still far under the copy+sort it
    * replaces) so a contract violation is a loud error, never a
    * silently-wrong count. */
  def overlapCountSorted(a: ArrayData, b: ArrayData): Long = {
    checkSortedNonNull(a, "left")
    checkSortedNonNull(b, "right")
    val m = a.numElements()
    val n = b.numElements()
    var cnt = 0L
    var p = 0
    var q = 0
    while (p < m && q < n) {
      val x = a.getLong(p)
      val y = b.getLong(q)
      if (x == y) {
        cnt += 1
        while (p < m && a.getLong(p) == x) p += 1
        while (q < n && b.getLong(q) == y) q += 1
      } else if (x < y) p += 1
      else q += 1
    }
    cnt
  }

  /** First index in `[lo0, hi0)` whose element is `>= v` (classic
    * lower bound over an ascending-sorted `ArrayData` range). */
  private def lowerBound(a: ArrayData, lo0: Int, hi0: Int, v: Long): Int = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** First index in `[lo0, hi0)` whose element is `> v`. */
  private def upperBound(a: ArrayData, lo0: Int, hi0: Int, v: Long): Int = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** The PPJoin+ suffix filter's partition bound (Xiao et al.,
    * "Efficient Similarity Joins for Near Duplicate Detection",
    * WWW'08 §4.2) over two ascending-sorted LONG arrays: a sound
    * upper bound on `overlapCount(a, b)` from recursive binary
    * partitioning. Pick the median value of the larger range, split
    * BOTH ranges around it (elements `< v` on one side can only match
    * elements `< v` on the other, the `== v` band contributes at most
    * one distinct match, likewise `> v`), recurse to `depth`, and
    * bound each leaf range pair by `min(|x|, |y|)`:
    *
    *   depth 0  →  min(m, n)            (the length filter's bound)
    *   depth d  →  Σ over ≤2^d leaves + exact probe hits, via
    *               O(2^d · log) binary searches — sublinear in the
    *               array sizes, monotonically tighter in d
    *               (spec-checked), and NEVER below the true distinct
    *               overlap, so a `bound ≥ α` filter is admit-only.
    *
    * SORTEDNESS CONTRACT: inputs must be ascending-sorted and
    * null-free; this kernel deliberately does NOT pre-scan (the
    * sublinear cost is its point). Its one call site (SSJoin's
    * verify) builds both arrays with `sort_array` in the same
    * projection, and every pair the filter ADMITS flows into
    * [[overlapCountSorted]], whose pre-scan loudly rejects the same
    * arrays if the contract were ever broken — a systematically
    * unsorted input cannot fail silently. */
  def suffixBound(a: ArrayData, b: ArrayData, depth: Int): Long =
    boundRange(a, 0, a.numElements(), b, 0, b.numElements(), depth)

  private def boundRange(a: ArrayData, al: Int, ar: Int,
                         b: ArrayData, bl: Int, br: Int, d: Int): Long = {
    val na = ar - al
    val nb = br - bl
    if (na == 0 || nb == 0) return 0L
    if (d <= 0) return math.min(na, nb).toLong
    // median of the LARGER range: splits the costlier side evenly, so
    // the leaf min() terms shrink fastest
    val v = if (na >= nb) a.getLong(al + na / 2) else b.getLong(bl + nb / 2)
    val alo = lowerBound(a, al, ar, v)
    val ahi = upperBound(a, alo, ar, v)
    val blo = lowerBound(b, bl, br, v)
    val bhi = upperBound(b, blo, br, v)
    // the == v band holds at most ONE distinct shared value
    val eq = if (ahi > alo && bhi > blo) 1L else 0L
    boundRange(a, al, alo, b, bl, blo, d - 1) + eq +
      boundRange(a, ahi, ar, b, bhi, br, d - 1)
  }
}

/** `overlap_count(a, b)` — `size(array_intersect(a, b))` for two
  * `ARRAY<BIGINT>` columns as a native codegen'd expression that
  * never materializes the intersection array. Internal kernel for
  * the SSJoin verify (its candidate volume makes the per-pair
  * intersection-array allocation measurable); deliberately NOT on
  * the `GraftExtensions` SQL surface — null elements raise instead
  * of reproducing `array_intersect`'s null semantics. NULL on
  * either ARRAY (not element) is NULL, like the built-in. */
case class OverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "overlap_count"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayPair.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.overlapCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels.overlapCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapCount =
    copy(left = newLeft, right = newRight)
}

/** Shared type check for the ARRAY<BIGINT> pair kernels. */
private[functions] object LongArrayPair {
  def check(prettyName: String, left: Expression,
            right: Expression): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** [[OverlapCount]] for ascending-sorted null-free inputs — the
  * SSJoin verify's per-pair kernel once each doc's array is sorted
  * ONCE (amortized over all its pairs) instead of per pair. Loudly
  * rejects unsorted or null-bearing input (see
  * [[SetKernels.overlapCountSorted]]); NULL on either ARRAY is NULL.
  * Internal, not on the SQL surface. */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap_count"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayPair.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.overlapCountSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels.overlapCountSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

/** `suffix_bound(a, b)` — the PPJoin+ suffix filter's recursive
  * partition bound (Xiao et al. WWW'08 §4.2) as a native codegen'd
  * expression: a sound upper bound on the distinct overlap of two
  * ascending-sorted ARRAY<BIGINT> columns in O(2^depth · log n)
  * probes. `bound < α` proves Jaccard < t without running the exact
  * merge; `bound ≥ α` admits the pair to [[SortedOverlapCount]]
  * (whose pre-scan also enforces this expression's sortedness
  * contract on every admitted pair). `depth` is a plan-time constant
  * baked into the generated call. NULL on either ARRAY is NULL.
  * Internal, not on the SQL surface. */
case class SuffixBound(left: Expression, right: Expression, depth: Int)
    extends BinaryExpression {
  require(depth >= 0, s"suffix_bound: depth must be >= 0, got $depth")

  override def dataType: DataType = LongType
  override def prettyName: String = "suffix_bound"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayPair.check(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.suffixBound(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], depth)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels.suffixBound($a, $b, $depth)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SuffixBound =
    copy(left = newLeft, right = newRight)
}
