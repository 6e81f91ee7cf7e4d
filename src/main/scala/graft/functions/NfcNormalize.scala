package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (`java.text.Normalizer`, Form.NFC) as a
  * native Catalyst expression — Spark ships no normalization builtin, and
  * a web-scale text pipeline needs canonical composition before hashing /
  * dedup (the same logical text arrives both precomposed `é` U+00E9 and
  * decomposed `e`+U+0301 from different crawlers; without NFC they hash
  * apart and every downstream dedup silently misses the pair).
  *
  * Why an Expression and not a UDF (SURVEY.md §7.3 preference order b):
  * stays inside whole-stage codegen next to the md5/fingerprint
  * expressions it feeds, no Row boxing, null handling for free via
  * `nullSafeCodeGen`. The JDK normalizer is a fast no-op scan for text
  * already in NFC (the overwhelming majority), so the common path is one
  * isNormalized-style pass.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** shared by interpreted eval and generated code */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
