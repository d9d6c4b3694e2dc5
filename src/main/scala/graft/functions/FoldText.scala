package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode case/diacritic folding for corpus
  * text normalization — NFC-normalize, lowercase (root locale), strip
  * combining marks (NFD -> drop Mn -> NFC). Covers exactly what Spark's
  * function library lacks; the whitespace-collapse half of normalization
  * stays in built-in `regexp_replace` (ext/TextOps.normalizeDocuments).
  *
  * Cross-engine contract: java.text.Normalizer implements the same
  * Unicode normalization forms the DuckDB oracle's utf8proc does
  * (nfc_normalize / strip_accents), so both engines agree byte-for-byte
  * on decomposable Latin/Greek/Cyrillic diacritics; locale-special
  * casings (Turkish dotted/dotless i) are deliberately out of contract.
  *
  * Null-safe; interpreted and codegen paths call ONE static fold, inlined
  * into whole-stage codegen.
  */
case class FoldText(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_text"

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      FoldText.fold(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.FoldText.fold($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): FoldText =
    copy(child = newChild)
}

object FoldText {
  /** NFC -> lowercase(ROOT) -> NFD -> drop non-spacing marks -> NFC. */
  def fold(s: String): String = {
    val lower = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val nfd =
      java.text.Normalizer.normalize(lower, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
  }
}
