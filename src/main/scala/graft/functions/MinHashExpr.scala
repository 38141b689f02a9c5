package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Dedup

/** `minhash_sigs(text)` — integer MinHash signatures of the 3-word
  * shingles of a whitespace-tokenized document, as `ARRAY<BIGINT>`.
  *
  * Semantically identical to the declarative HOF pipeline
  * ([[graft.operators.Dedup.minhashIntSigs]]) and to the DuckDB oracle:
  * shingle → md5 hex → first 15 hex digits as a long, mod P → per-perm
  * `(a_j*h + b_j) mod P` minimum. A native expression because the HOF
  * expression tree is interpreted per element (~4 ms/doc measured at
  * sf0.1); this tight loop is ~100× cheaper and is the hot path of
  * near-dup at corpus scale. Null/short docs (< 3 tokens) → null.
  *
  * Fully codegen'd: `doGenCode` emits a call to the static
  * [[MinHashSigs.compute]] helper (shared with the interpreted path),
  * so projections containing it stay inside WholeStageCodegen instead
  * of falling back to per-row interpretation.
  */
case class MinHashSigs(child: Expression, perms: Int)
    extends UnaryExpression with RequiresStringInput {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (perms >= 1 && perms <= Dedup.HashA.length) base
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName: perms must be in [1, ${Dedup.HashA.length}], got $perms")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // A non-null short doc (< 3 tokens) still evaluates to null.
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[UTF8String], perms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigs.compute($c, $perms);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  def apply(c: Column, perms: Int): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(c), perms))

  // One digest per thread, reset between rows — MessageDigest.getInstance
  // per row was the dominant constant cost of the interpreted version.
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Shared eval/codegen kernel (called from generated Java via the
    * static forwarder). Returns null for docs with < 3 tokens. */
  def compute(input: UTF8String, perms: Int): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < 3) return null
    val P = Dedup.HashP
    val mins = Array.fill(perms)(Long.MaxValue)
    val digest = md5.get()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val d = digest.digest(sb.toString.getBytes("UTF-8"))
      digest.reset()
      // first 15 hex digits = the top 7.5 bytes of the digest
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      h %= P
      var j = 0
      while (j < perms) {
        val v = (h * Dedup.HashA(j) + Dedup.HashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
