package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rule-based sentence segmentation — the unit every sentence-level
  * stage needs (sentence-window chunking for retrieval, per-sentence
  * dedup, quality heuristics like mean sentence length). A boundary is
  * a run of `.` `!` `?` (plus closing quotes/brackets) followed by
  * whitespace and an uppercase letter or digit — with an abbreviation
  * guard on `.` (Dr. / Inc. / U.S. do not end sentences even before an
  * uppercase word). Deliberately deterministic and lookahead-free so
  * the rule replays in any engine; a model-based segmenter is out of
  * scope the same way true video codecs are (documented stub seam).
  */
object SentenceKernels {
  /** Common abbreviations whose trailing period does not end a
    * sentence (lowercased, final period stripped). The web-prose set:
    * honorifics, corporate suffixes, Latin abbreviations.
    */
  private val abbrevs = Set(
    "mr", "mrs", "ms", "dr", "prof", "rev", "gen", "sen", "rep", "st",
    "jr", "sr", "inc", "corp", "ltd", "co", "llc", "plc", "vs", "etc",
    "no", "fig", "vol", "dept", "est", "approx", "e.g", "i.e", "u.s",
    "u.k", "a.m", "p.m")

  private def lastWord(s: String, end: Int): String = {
    var i = end - 1
    while (i >= 0 && !Character.isWhitespace(s.charAt(i))) i -= 1
    s.substring(i + 1, end).toLowerCase
  }

  /** Split `text` into trimmed, non-empty sentences. */
  def split(text: String): Array[String] = {
    if (text == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        // the candidate terminator run: .!? then closing quotes/brackets
        var j = i
        while (j < n && (text.charAt(j) == '.' || text.charAt(j) == '!' ||
          text.charAt(j) == '?')) j += 1
        val isPeriodOnly = text.substring(i, j).forall(_ == '.')
        var k = j
        while (k < n && (text.charAt(k) == '"' || text.charAt(k) == '\'' ||
          text.charAt(k) == ')' || text.charAt(k) == ']')) k += 1
        // whitespace then sentence-initial char (or end of text)
        var w = k
        while (w < n && Character.isWhitespace(text.charAt(w))) w += 1
        val followerOk = w == n ||
          (w > k && (Character.isUpperCase(text.charAt(w)) ||
            Character.isDigit(text.charAt(w))))
        val abbrevGuard = isPeriodOnly && {
          val word = lastWord(text, i)
          abbrevs.contains(word) || word.length == 1 // single initials: J.
        }
        if (followerOk && !abbrevGuard) {
          val seg = text.substring(start, k).trim
          if (seg.nonEmpty) out += seg
          start = w
          i = w
        } else i = j
      } else i += 1
    }
    if (start < n) {
      val seg = text.substring(start, n).trim
      if (seg.nonEmpty) out += seg
    }
    out.toArray
  }
}

/** `sentences(text)` — [[SentenceKernels.split]] as a codegen scalar
  * returning `array<string>`; null in, null out. Composes with
  * `explode`, `posexplode`, `size`, and the chunking tier directly.
  */
case class SentencesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sentences_of"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SentenceKernels.split(input.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("sents")
      val out = ctx.freshName("utf8")
      s"""String[] $arr = graft.llmops.SentenceKernels.split($c.toString());
         |Object[] $out = new Object[$arr.length];
         |for (int i = 0; i < $arr.length; i++) {
         |  $out[i] = UTF8String.fromString($arr[i]);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SentencesExpr =
    copy(child = c)
}

object Sentences {
  /** Column wrapper for [[SentencesExpr]]. */
  def sentences(text: Column): Column =
    ColumnBridge.column(SentencesExpr(ColumnBridge.expression(text)))
}
