package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the text-canonicalization pass every
  * training corpus runs before tokenization and hashing (a decomposed
  * `a` + U+0301 and the precomposed U+00E1 are the SAME text to a
  * reader but different bytes to every dedup hash, token counter, and
  * BPE merge in the pipeline). Spark has no built-in normalizer, so
  * this is a native Catalyst expression over `java.text.Normalizer`:
  * codegen'd (stays inside the scan's whole-stage span), with an
  * `isNormalized` fast path so the common already-NFC document costs
  * one scan and ZERO allocation — at 100 TB nearly all text is already
  * composed and the normalizer should be a read-only verify, not a
  * copy.
  */
object UnicodeNorm {
  def nfcUTF8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — canonical composition (Unicode NFC), matching
  * DuckDB's `nfc_normalize` (both implement UAX #15). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with RequiresStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfcUTF8(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfcUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
