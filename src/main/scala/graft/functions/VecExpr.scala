package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_dot(a, b)` — the inner product of two `ARRAY<DOUBLE>` columns,
  * as a NATIVE codegen'd expression.
  *
  * Replaces the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * on the engine's hottest scalar path: every MaxSim pair (d105/d106/
  * d139/d141 score `|corpus tokens| × collided probes` of these per
  * batch), every cosine (s01's batch top-k, the SemDeDup gates, the
  * d140 matrix) and every norm. Catalyst's `HigherOrderFunction`s are
  * `CodegenFallback` — each evaluation drops out of whole-stage
  * codegen, boxes the lambda variables per element, and `zip_with`
  * materializes an intermediate product array per pair. This
  * expression emits a bare fused multiply-add loop inside the
  * surrounding codegen stage instead.
  *
  * The float math is BIT-IDENTICAL to the HOF form (the DuckDB
  * oracles replay it): a strict left fold `((0.0 + a0·b0) + a1·b1)…`
  * in index order, no reordering, no FMA contraction (Java evaluates
  * `acc + a*b` as multiply-then-add under strict FP semantics).
  * Null semantics replicate the HOF chain exactly: NULL array on
  * either side → NULL (null-intolerant binary expression); length
  * mismatch → NULL (`zip_with` pads the shorter side with NULLs, the
  * padded product is NULL, and the running sum absorbs it); any NULL
  * element → NULL (NULL product poisons the fold).
  *
  * Inputs must be `ARRAY<DOUBLE>` — a FLOAT-element caller would have
  * computed its products in FLOAT precision under the HOF form, so
  * silently widening here would change results; the type check makes
  * such a site fail analysis loudly instead (cast with `asDouble`
  * first, which is what every shipped call site does).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `vec_dist2(a, b)` — squared L2 distance of two `ARRAY<DOUBLE>`
  * columns; the [[DotProduct]] treatment applied to the OTHER hot
  * scalar fold, `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)),
  * 0.0, +)` (the k-means / PQ / IVF assignment kernel —
  * `Quantize.dist2` runs it per (vector × centroid) pair in every
  * Lloyd round and every cell-routing probe). Identical left-fold
  * float math and null semantics; same ARRAY<DOUBLE>-only guard. */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}
