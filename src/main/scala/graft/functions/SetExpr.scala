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

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

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
