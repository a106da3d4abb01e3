package graft.llmops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-gram kernel: one pass over the text, distinct grams in
  * first-seen order. Semantics are EXACTLY
  * `array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
  * i => concat_ws(" ", slice(split(lower(trim(text)), "\\s+"), i, n))))`
  * — the higher-order-function formulation [[TextFuncs.wordNgrams]]
  * used to build inline (and the DuckDB oracles still mirror):
  * lowercased, whitespace-split, space-joined; a text shorter than n
  * tokens yields its whole token join as the single gram; an
  * empty/whitespace text yields one empty gram (split of "" is [""]).
  *
  * Why an Expression: the HOF pipeline allocates a token array, a
  * sequence array, a slice and a concat per gram, all interpreted —
  * measured as the dominant cost of the n-gram decontamination pass.
  * The kernel builds each gram with a rolling StringBuilder window
  * and generated code calls it statically, keeping the projection in
  * one whole-stage span.
  */
object NgramKernels {

  // identical pattern object semantics to Spark's split(_, "\\s+"):
  // ASCII \s classes, limit -1 keeps trailing empties
  private val ws = java.util.regex.Pattern.compile("\\s+")

  // ONE source of truth: the kernel must shingle the SAME token space
  // the tokenizer seam produces, so the predicate delegates to
  // TextFuncs.isNoSpaceScript over TextFuncs.noSpaceScriptRanges (the
  // hand-duplicated range copy that used to live here was the drift
  // risk VERDICT r10 flagged)
  private def isNoSpaceScript(c: Char): Boolean =
    TextFuncs.isNoSpaceScript(c)

  /** TextFuncs.isolateNoSpaceScripts as a string pass: each CJK/kana
    * codepoint becomes its own whitespace-delimited token. Identity
    * (no allocation) when no such codepoint is present.
    */
  private def isolate(text: String): String = {
    var i = 0
    var has = false
    while (i < text.length && !has) {
      if (isNoSpaceScript(text.charAt(i))) has = true
      i += 1
    }
    if (!has) return text
    val sb = new java.lang.StringBuilder(text.length + 16)
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (isNoSpaceScript(c)) sb.append(' ').append(c).append(' ')
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def wordNgrams(text0: String, n: Int): GenericArrayData =
    wordNgramsSeg(text0, n, null)

  /** Segmenter-aware kernel body: `seg == null` means the built-in
    * char-level isolation (the hot default — no virtual dispatch);
    * otherwise the pluggable [[Segmenter]] decides the token
    * boundaries, so shingles match `TextFuncs.tokens(text, seg)`.
    */
  def wordNgramsSeg(text0: String, n: Int, seg: Segmenter): GenericArrayData = {
    // same stage order as TextFuncs.tokens: isolate, THEN trim/lower
    val text = if (seg == null) isolate(text0) else seg.segment(text0)
    // Spark's trim strips ONLY ' ' (0x20) — String.trim would also
    // strip \n/\t and change the token list for texts bounded by them
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    // plain toLowerCase matches UTF8String.toLowerCase's non-ASCII
    // fallback (same JVM default locale on both paths)
    val t = text.substring(b, e).toLowerCase
    val tokens = ws.split(t, -1)

    val m = tokens.length
    val windows = math.max(m - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String]()
    var w = 0
    while (w < windows) {
      val sb = new java.lang.StringBuilder()
      var j = w
      val end = math.min(w + n, m)
      while (j < end) {
        if (j > w) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Codegen entry point. */
  def wordNgramsU(text: UTF8String, n: Int): GenericArrayData =
    wordNgrams(text.toString, n)

  /** Codegen entry point, segmenter-aware. */
  def wordNgramsSegU(text: UTF8String, n: Int, seg: Segmenter): GenericArrayData =
    wordNgramsSeg(text.toString, n, seg)
}

/** `word_ngrams(text, n)` → array<string> of distinct grams (codegen'd).
  * The default [[Segmenter.CharLevel]] keeps the original static call
  * (no reference object, no dispatch); any other segmenter rides along
  * as a codegen reference object.
  */
case class WordNgrams(child: Expression, n: Int,
                      seg: Segmenter = Segmenter.CharLevel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    if (seg == Segmenter.CharLevel)
      NgramKernels.wordNgramsU(input.asInstanceOf[UTF8String], n)
    else
      NgramKernels.wordNgramsSegU(input.asInstanceOf[UTF8String], n, seg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (seg == Segmenter.CharLevel)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.llmops.NgramKernels.wordNgramsU($c, $n);")
    else {
      val ref = ctx.addReferenceObj("seg", seg, "graft.llmops.Segmenter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.llmops.NgramKernels.wordNgramsSegU($c, $n, $ref);")
    }
  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}
