package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftshim.ColumnBridge

/** Pluggable word segmentation for no-space scripts — the seam behind
  * [[TextFuncs.tokens]] (and therefore BM25, vocabulary stats, TF-IDF,
  * n-gram shingles).
  *
  * The default, [[Segmenter.CharLevel]], is the engine's documented
  * UAX#29-lite behavior: every CJK/kana/Thai-family codepoint becomes
  * its own token (TextFuncs.noSpaceScriptRanges scaladoc). That is
  * exactly right for CJK (one ideograph ≈ one word-break unit) but a
  * deliberate approximation for Thai/Lao/Khmer/Myanmar, whose real
  * word boundaries need a dictionary or statistical model. This trait
  * makes that a USER decision — the same production-seam pattern as
  * `services.PageFetcher` (plug a real renderer) and
  * `pipeline.StructuredExtractor` (plug a real LLM): the library ships
  * a correct deterministic default plus a dictionary implementation,
  * and a production deployment drops in its own segmenter without
  * touching any operator.
  *
  * Contract: `segment` returns text whose no-space-script runs have
  * single spaces inserted at every token boundary (surrounding
  * whitespace is fine — the downstream tokenizer splits on `\s+`), and
  * is IDENTITY (same reference, no allocation) on text containing no
  * no-space-script codepoint, so Latin-mass corpora pay only the scan.
  * Implementations must be deterministic and `Serializable` (the
  * object rides into codegen as a reference object, like the OPQ
  * rotation matrix).
  */
trait Segmenter extends Serializable {

  /** Insert token-boundary spaces into no-space-script runs; identity
    * on text with no such codepoints. Must map null to null.
    */
  def segment(text: String): String
}

object Segmenter {

  /** One codepoint per token — the engine default. Delegates to the
    * [[TextFuncs.isolateNoSpaceScriptsJvm]] kernel body, so
    * `tokens(c, CharLevel)` is bit-identical to `tokens(c)`.
    */
  case object CharLevel extends Segmenter {
    override def segment(text: String): String =
      TextFuncs.isolateNoSpaceScriptsJvm(text)
  }

  /** Greedy longest-match ("maximal munch") dictionary segmenter —
    * the classic dictionary approach to Thai-family segmentation
    * (the newmm/ICU-dictionary family): at each no-space-script
    * codepoint, take the LONGEST dictionary word starting there; if
    * none matches, fall back to the single codepoint (the CharLevel
    * behavior), so unknown vocabulary degrades to the default rather
    * than disappearing. Deterministic by construction.
    *
    * Scale shape: the dictionary is a bounded driver-side model (a
    * hash set + max word length), shipped once per executor inside
    * the codegen reference object — the per-char cost on segmentable
    * runs is O(maxWordLen) hash probes, and Latin text still exits on
    * the first range comparison.
    */
  final case class Dictionary(words: Set[String]) extends Segmenter {
    require(words.nonEmpty, "Dictionary segmenter needs at least one word")
    require(words.forall(_.nonEmpty), "dictionary words must be non-empty")
    private val maxLen = words.iterator.map(_.length).max

    override def segment(text: String): String = {
      if (text == null) return null
      val n = text.length
      var i = 0
      while (i < n && !TextFuncs.isNoSpaceScript(text.charAt(i))) i += 1
      if (i == n) return text
      val sb = new java.lang.StringBuilder(n + 64)
      sb.append(text, 0, i)
      while (i < n) {
        if (!TextFuncs.isNoSpaceScript(text.charAt(i))) {
          sb.append(text.charAt(i))
          i += 1
        } else {
          var take = 1
          var l = math.min(maxLen, n - i)
          while (l > 1 && take == 1) {
            if (words.contains(text.substring(i, i + l))) take = l
            l -= 1
          }
          sb.append(' ').append(text, i, i + take).append(' ')
          i += take
        }
      }
      sb.toString
    }
  }

  /** Classpath location of the bundled Thai starter lexicon. */
  val ThaiLexiconResource = "/graft/lexicon/thai-common.txt"

  /** Load a [[Dictionary]] from a UTF-8 word list — one word per
    * line, blank lines and `#` comments skipped. Resolves from the
    * classpath, so the bundled lexicon and a deployment's own
    * resource both load the same way. The list is a bounded
    * driver-side model (same contract as Dictionary itself).
    */
  def dictionaryFromResource(resource: String = ThaiLexiconResource)
      : Dictionary = {
    val in = Option(getClass.getResourceAsStream(resource)).getOrElse(
      throw new IllegalArgumentException(
        s"lexicon resource not found on classpath: $resource"))
    val words =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
      finally in.close()
    Dictionary(words)
  }

  /** The bundled starter lexicon (~160 common Thai words): enough to
    * make [[Dictionary]] segmentation usable out of the box and to
    * pin the loader; a production deployment should load a FULL
    * public lexicon (README "No-space-script segmentation" names the
    * public sources) through [[dictionaryFromResource]].
    */
  lazy val BundledThai: Dictionary =
    dictionaryFromResource(ThaiLexiconResource)

  /** `segment_text(text)` with the segmenter riding along as a codegen
    * reference object. [[TextFuncs.tokens]]'s CharLevel fast path keeps
    * using the dedicated [[IsolateNoSpaceScripts]] kernel; this
    * expression serves every other implementation.
    */
  case class SegmentText(child: Expression, seg: Segmenter)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "segment_text"
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(seg.segment(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("seg", seg, "graft.llmops.Segmenter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = UTF8String.fromString($ref.segment($c.toString()));")
    }
    override protected def withNewChildInternal(c: Expression): SegmentText =
      copy(child = c)
  }

  def segmentText(text: Column, seg: Segmenter): Column =
    ColumnBridge.column(SegmentText(ColumnBridge.expression(text), seg))
}
