package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** `pq_encode(embedding)` — product-quantization codes of a float
  * vector against a literal codebook (`m` subquantizers × `k` centroids
  * × `d` dims, flattened), as `ARRAY<INT>`.
  *
  * Bit-identical to the declarative [[graft.operators.Quantize.encode]]
  * (same ascending-dimension left-fold of `(x−c)²`, exact float→double
  * widening, argmin ties to the lowest centroid index) — asserted by
  * OperatorsSpec. A native expression because the declarative tree is
  * ~3500 nodes per row and falls out of whole-stage codegen into
  * per-node interpreted eval; this tight loop is the per-row cost a
  * billion-vector index build actually pays.
  *
  * Fully codegen'd: `doGenCode` calls the static [[PqEncode.compute]]
  * kernel (shared with the interpreted path); the codebook rides along
  * as a codegen reference object, not inlined source. Vectors shorter
  * than `m·d` → null.
  */
case class PqEncode(child: Expression, codebook: Seq[Double],
                    m: Int, k: Int, d: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (codebook.length == m * k * d) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: codebook has ${codebook.length} values, expected m*k*d = ${m * k * d}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }
  // containsNull: a slot whose dims include a NULL element yields a
  // NULL code (same as the declarative encode, where every distance in
  // that slot is NULL, array_min is NULL, and array_position of NULL
  // is NULL).
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], cbArr, m, k, d)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PqEncode.compute($c, $cbRef, $m, $k, $d);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Column wrapper over a nested codebook cb(m)(j) = centroid vector. */
  def apply(c: Column, cb: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, d) = (cb.length, cb.head.length, cb.head.head.length)
    GraftBridge.column(
      PqEncode(GraftBridge.expression(c), cb.flatten.flatten, m, k, d))
  }

  /** Shared eval/codegen kernel. Same arithmetic order as the
    * declarative encode: per centroid, dims ascending, `s += diff²`
    * from 0.0; strict `<` keeps the first (lowest-index) minimum; a
    * slot touching a NULL element encodes to NULL (see dataType note). */
  def compute(input: ArrayData, cb: Array[Double],
              m: Int, k: Int, d: Int): ArrayData = {
    if (input.numElements() < m * d) return null
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var slotHasNull = false
      var i = 0
      while (i < d && !slotHasNull) {
        slotHasNull = input.isNullAt(mi * d + i); i += 1
      }
      if (slotHasNull) codes(mi) = null
      else {
        var best = Double.PositiveInfinity
        var bestJ = 0
        var j = 0
        while (j < k) {
          val base = (mi * k + j) * d
          var s = 0.0
          var i2 = 0
          while (i2 < d) {
            val diff = input.getFloat(mi * d + i2).toDouble - cb(base + i2)
            s += diff * diff
            i2 += 1
          }
          if (s < best) { best = s; bestJ = j }
          j += 1
        }
        codes(mi) = bestJ
      }
      mi += 1
    }
    new GenericArrayData(codes)
  }
}
