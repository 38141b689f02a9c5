package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class ExplodeShingles(child: Expression, n: Int)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && n >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, n >= 1), got (${child.dataType.sql}, $n)")
  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)
  override def prettyName: String = "explode_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
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

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeShingles =
    copy(child = newChildren.head)
}

object ExplodeShingles {
  def apply(c: Column, n: Int = 3): Column =
    GraftBridge.column(ExplodeShingles(GraftBridge.expression(c), n))
}
