package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graft.bridge.AbstractType
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the preprocessing step every multilingual
  * corpus pipeline runs before hashing, shingling, or tokenizing (CCNet
  * normalizes + strips accents before its LM; fastText folds accents for
  * its language ID): canonically equivalent spellings (`é` composed vs
  * `e` + U+0301) MUST hash identically or every dedup/langid stage silently
  * misses cross-representation duplicates.
  *
  * Both ops are codegen'd Catalyst [[UnaryExpression]]s (one static call
  * per row inside whole-stage codegen — the Md5Prefix pattern, not a UDF).
  * Engine parity: DuckDB's `nfc_normalize` / `strip_accents` (utf8proc)
  * agree with the JDK's `java.text.Normalizer` on canonical composition —
  * both implement Unicode normalization as specified — which keeps the
  * oracle expressible.
  */
object NormalizeFunctions {

  /** Pure model: Unicode NFC canonical composition. */
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Pure model: accent folding — NFD decompose, drop every non-spacing
    * combining mark (Unicode category Mn), code-point aware. `café`/`café`
    * (either representation) → `cafe`.
    */
  def stripAccents(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def nfcUTF8(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(nfc(s.toString))

  def stripAccentsUTF8(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(stripAccents(s.toString))

  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column forms. */
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def strip_accents(c: Column): Column = column(StripAccents(expression(c)))
}

/** Catalyst expression for [[NormalizeFunctions.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeFunctions.nfcUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeFunctions.nfcUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Catalyst expression for [[NormalizeFunctions.stripAccents]]. */
case class StripAccents(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeFunctions.stripAccentsUTF8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeFunctions.stripAccentsUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}
