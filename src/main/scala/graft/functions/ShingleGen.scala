package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `explode_shingles(text[, n])` — one output row per n-word shingle of
  * a whitespace-tokenized document (default n=3).
  *
  * A native `Generator` (the UDTF extension surface, SURVEY.md §2.2
  * UDF/UDAF/UDTF row): Catalyst plans it as a `Generate` node exactly
  * like `explode`, so downstream aggregation gets map-side partial
  * aggregation over the generated rows; the row production itself is a
  * tight loop (no intermediate array allocation per document, unlike
  * `explode(shingles(...))`).
  *
  * Implements `doGenCode` (GenerateExec's IterableOnce protocol: the
  * generated value must be a never-null `IterableOnce<InternalRow>`
  * that the exec's loop `.iterator()`s over), so `Generate` joins the
  * surrounding WholeStageCodegen span instead of severing it — with
  * `CodegenFallback` the generator would force `supportCodegen=false`
  * on the whole `GenerateExec`.
  */
case class ExplodeShingles(child: Expression, n: Int)
    extends Expression with Generator {

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, n >= 1), got (${child.dataType.sql}, $n)")
  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)
  override def prettyName: String = "explode_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    ExplodeShingles.iter(child.eval(input).asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val value = ctx.freshName("shingleIter")
    val cls = "scala.collection.IterableOnce<org.apache.spark.sql.catalyst.InternalRow>"
    ev.copy(
      code = code"""
        ${childGen.code}
        $cls $value = graft.functions.ExplodeShingles.iter(
          ${childGen.isNull} ? null : ${childGen.value}, $n);
      """,
      isNull = FalseLiteral,
      value = JavaCode.variable(value, classOf[IterableOnce[InternalRow]]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeShingles =
    copy(child = newChildren.head)
}

object ExplodeShingles {
  def apply(c: Column, n: Int = 3): Column =
    GraftBridge.column(ExplodeShingles(GraftBridge.expression(c), n))

  /** Shared eval/codegen kernel (generated Java calls the static
    * forwarder). Never returns null: null/short input → empty. */
  def iter(s: UTF8String, n: Int): Iterator[InternalRow] = {
    if (s == null) return Iterator.empty
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }
}
