package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the first cleaning step of any
  * multilingual training-data pipeline (mixed NFC/NFD sources hash and
  * dedup differently for VISUALLY IDENTICAL text; accent folding is the
  * standard pre-tokenization step for fuzzy matching). Spark has no
  * built-in for either, and a Scala UDF here would box every row and
  * fall out of whole-stage codegen — so both are native expressions
  * with `doGenCode` (the §2.10 pattern), calling the shared JVM
  * implementation through a referenced object.
  *
  * Determinism: java.text.Normalizer implements Unicode Standard
  * Annex #15 — stable for a given Unicode version, identical across
  * executors (one JVM version per cluster). The d01/d02 dedup families
  * compose with [[UnicodeFunctions.nfc]] upstream so byte-distinct but
  * canonically-equal texts dedup together.
  */
object UnicodeFunctions extends Serializable {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Canonical composition (NFC): é as e+◌́ becomes the single é. */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Accent folding: NFD-decompose, drop all combining marks — é→e,
    * ü→u; characters with no decomposition pass through unchanged. */
  def stripAccents(s: String): String =
    marks.matcher(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD))
      .replaceAll("")

  def nfcCol(c: Column): Column =
    org.apache.spark.sql.graftglue.GraftGlue.column(
      NfcNormalize(org.apache.spark.sql.graftglue.GraftGlue.expression(c)))
  def stripAccentsCol(c: Column): Column =
    org.apache.spark.sql.graftglue.GraftGlue.column(
      StripAccents(org.apache.spark.sql.graftglue.GraftGlue.expression(c)))
}

abstract class UnicodeUnaryString extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  protected def transform(s: String): String

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(transform(input.asInstanceOf[UTF8String].toString))

  /** Generated code calls the same [[UnicodeFunctions]] method used by
    * the interpreted path (rides along as a referenced object), keeping
    * the operator inside whole-stage codegen with zero per-row lambda
    * boxing. */
  protected def genCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fns = ctx.addReferenceObj("unicodeFns", UnicodeFunctions,
        UnicodeFunctions.getClass.getName)
      val utf8 = classOf[UTF8String].getName
      s"${ev.value} = $utf8.fromString($fns.$genCall($a.toString()));"
    })
}

case class NfcNormalize(child: Expression) extends UnicodeUnaryString {
  override def prettyName: String = "nfc_normalize"
  override protected def transform(s: String): String = UnicodeFunctions.nfc(s)
  override protected def genCall: String = "nfc"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnicodeUnaryString {
  override def prettyName: String = "strip_accents"
  override protected def transform(s: String): String =
    UnicodeFunctions.stripAccents(s)
  override protected def genCall: String = "stripAccents"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
