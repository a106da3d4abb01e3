package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels — the canonical-form tier every
  * large-scale text pipeline runs before tokenization, dedup, or
  * quality scoring (CCNet and the Gopher/MassiveText pipeline both
  * normalize before anything else). Two byte sequences that RENDER
  * identically ("é" as U+00E9 vs `e` + U+0301) hash differently, so an
  * un-normalized corpus silently defeats exact dedup, splits token
  * statistics, and double-counts vocabulary — at 100 TB the cheapest
  * fix is one codegen'd projection at ingest.
  *
  * Static methods on an object so generated code can call them
  * (the [[UrlKernels]] pattern). All kernels are null-in/null-out and
  * idempotent.
  *
  * Reference analog: the scraper stores page text and filenames raw
  * (/root/reference/src/enhanced_selenium_scraper.py:760-800), which is
  * exactly the operating mode that lets the two "é" spellings coexist;
  * this tier is the scale-out correction.
  */
object NormKernels {
  private val marks = java.util.regex.Pattern.compile("\\p{M}+")
  private val controls =
    java.util.regex.Pattern.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
  private val wsRuns = java.util.regex.Pattern.compile("[ \\t\\n\\r]+")

  /** Unicode NFC (canonical composition) — DuckDB's `nfc_normalize`,
    * utf8proc NFC. The exact-dedup/token-identity canonical form.
    */
  def nfc(s: String): String = {
    if (s == null) return null
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
  }

  /** Unicode NFKC (compatibility composition): folds ligatures (ﬁ→fi),
    * fullwidth forms (Ａ→A), superscripts and vulgar fractions into
    * their plain spellings — the tokenizer-facing fold (SentencePiece's
    * default normalizer is NFKC-based, Kudo & Richardson 2018 §4.1).
    */
  def nfkc(s: String): String = {
    if (s == null) return null
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFKC)
  }

  /** Accent/diacritic removal: NFD-decompose, drop combining marks
    * (categories Mn/Mc/Me), re-compose. Matches DuckDB/utf8proc
    * `strip_accents` on Latin text ('Mühleisen' → 'Muhleisen');
    * standalone compatibility characters (œ, ﬁ, ½) are NOT folded —
    * that is [[nfkc]]'s job.
    */
  def stripAccents(s: String): String = {
    if (s == null) return null
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val stripped = marks.matcher(d).replaceAll("")
    // Re-compose so the output is in the same canonical form as nfc().
    if (stripped.length == d.length) nfc(s)
    else Normalizer.normalize(stripped, Normalizer.Form.NFC)
  }

  /** Whitespace/control cleanup: C0 controls (minus \t \n \r) and DEL
    * removed, whitespace runs collapsed to one space, ends trimmed.
    * The crawl-payload artifact scrub (NUL bytes from binary sniffs,
    * \f page breaks from PDF text, indentation runs from HTML).
    */
  def cleanText(s: String): String = {
    if (s == null) return null
    wsRuns.matcher(controls.matcher(s).replaceAll(""))
      .replaceAll(" ").trim
  }
}

private[expr] abstract class NormExprBase extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  /** Kernel method name on [[NormKernels]], spliced into codegen. */
  protected def kernel: String
  /** The same kernel as a direct reference for the interpreted path. */
  protected def kernelFn: String => String

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(kernelFn(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = UTF8String.fromString(
         |  graft.expr.NormKernels.$kernel($c.toString()));""".stripMargin)
}

/** `nfc_norm(text)` — Unicode NFC as a codegen scalar. */
case class NfcNormalize(child: Expression) extends NormExprBase {
  override def prettyName: String = "nfc_norm"
  override protected def kernel: String = "nfc"
  override protected def kernelFn: String => String = NormKernels.nfc
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** `nfkc_norm(text)` — Unicode NFKC as a codegen scalar. */
case class NfkcNormalize(child: Expression) extends NormExprBase {
  override def prettyName: String = "nfkc_norm"
  override protected def kernel: String = "nfkc"
  override protected def kernelFn: String => String = NormKernels.nfkc
  override protected def withNewChildInternal(c: Expression): NfkcNormalize =
    copy(child = c)
}

/** `strip_accents(text)` — diacritic removal as a codegen scalar. */
case class StripAccents(child: Expression) extends NormExprBase {
  override def prettyName: String = "strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def kernelFn: String => String = NormKernels.stripAccents
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

/** `clean_text(text)` — control-strip + whitespace-collapse scalar. */
case class CleanText(child: Expression) extends NormExprBase {
  override def prettyName: String = "clean_text"
  override protected def kernel: String = "cleanText"
  override protected def kernelFn: String => String = NormKernels.cleanText
  override protected def withNewChildInternal(c: Expression): CleanText =
    copy(child = c)
}

object NormFuncs {
  def nfc_norm(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def nfkc_norm(text: Column): Column =
    ColumnBridge.column(NfkcNormalize(ColumnBridge.expression(text)))
  def strip_accents(text: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(text)))
  def clean_text(text: Column): Column =
    ColumnBridge.column(CleanText(ColumnBridge.expression(text)))
}
