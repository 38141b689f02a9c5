package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** `token_vec(term, dim)` — the deterministic pseudo token embedding
  * of the late-interaction family (component j of dim is
  * `hash60(j + "_" + term) % 1000 / 1000.0 - 0.5`), as a NATIVE
  * codegen'd expression.
  *
  * Replaces the higher-order-function form
  * `transform(sequence(1, dim), j => (conv(substring(md5(concat(j,
  * "_", term)), 1, 15), 16, 10) % 1000) / 1000.0 - 0.5)` on the
  * MaxSim family's vector-projection path (round 20, the m12/r15
  * interpreted-HOF lesson): Catalyst `transform` is CodegenFallback —
  * every doc token paid dim interpreted expression-tree walks, each
  * building a hex STRING from md5 and re-parsing it via `conv` —
  * where this kernel folds the digest's first 15 nibbles directly
  * (the [[MinHashSigs.compute]] technique, one ThreadLocal digest per
  * task thread) inside the surrounding whole-stage-codegen span.
  *
  * BIT-IDENTICAL to the HOF form (the DuckDB oracles replay it as
  * `(('0x' || substr(md5(j || '_' || t), 1, 15))::BIGINT % 1000) /
  * 1000.0 - 0.5`): Spark's `md5` hex-encodes the UTF-8 bytes, so the
  * first 15 hex chars ARE the digest's first 15 nibbles; the value is
  * 60-bit non-negative, so `% 1000` matches Java's `%`; the division
  * and subtraction are the same two IEEE ops. Null term → NULL array
  * (the shipped call sites never feed one: both token streams explode
  * non-null splits). */
case class TokenVec(child: Expression, dim: Int)
    extends UnaryExpression with RequiresStringInput {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "token_vec"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (dim >= 1) base
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: dim must be >= 1, got $dim")
  }

  override def nullSafeEval(input: Any): Any =
    TokenVec.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TokenVec.compute($c, $dim);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): TokenVec = copy(child = newChild)
}

object TokenVec {
  def apply(c: org.apache.spark.sql.Column, dim: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      TokenVec(org.apache.spark.sql.GraftBridge.expression(c), dim))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared eval/codegen kernel. Component j (1-based) is the first
    * 60 bits of md5(j + "_" + term) mod 1000, mapped to
    * [-0.5, 0.5) — the [[MinHashSigs.compute]] nibble fold. */
  def compute(term: org.apache.spark.unsafe.types.UTF8String,
              dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val t = term.toString
    val digest = md5.get()
    val out = new Array[Double](dim)
    var j = 1
    while (j <= dim) {
      val d = digest.digest((j + "_" + t).getBytes("UTF-8"))
      digest.reset()
      // first 15 hex digits = the top 7.5 bytes of the digest
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      out(j - 1) = (h % 1000L).toDouble / 1000.0 - 0.5
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
