package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines, expressed as
  * pure Catalyst column pipelines (codegen-eligible, no UDFs) so they
  * scale: every function here is a narrow map — no shuffle — and can be
  * mirrored exactly in ANSI SQL for the DuckDB oracle.
  */
object TextFuncs {

  /** Whitespace tokenization (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Token count — whitespace tokenizer. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** A BPE-ish subword proxy: counts word chunks of ≤ 4 chars, the
    * standard ~4-chars-per-token heuristic, as ceil(len/4) per word.
    */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))

  /** GPT-2-style pretokenizer pattern: contractions, letter runs,
    * digit runs, punctuation runs (lowercased input, so no upper
    * class). Shared verbatim with the DuckDB oracle.
    */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9']+"

  /** BPE-ish regex pretokenization (the merge step is model-specific;
    * the pretokenizer split is what data pipelines count).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Stopword sets used by the language-ID heuristic. Tiny n-gram-free
    * heuristic: score = stopword hits per language, argmax wins,
    * "und" (undetermined) when nothing hits.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "et"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /** Stopword occurrence count (with multiplicity) for one language. */
  def langHitsFromTokens(toks: Column, lang: String): Column =
    size(filter(toks,
      t => array_contains(array(langStopwords(lang).map(lit): _*), t)))

  /** Heuristic language ID over the declared stopword sets: the language
    * with the most stopword occurrences wins; ties break alphabetically
    * (first-match-wins `>=` chain); zero hits → "und". Defined so the
    * exact same logic is expressible in ANSI SQL for the oracle.
    *
    * Takes a token array so callers tokenize once — the split is the
    * expensive part and Catalyst does not CSE it across the five
    * per-language filters.
    */
  def langIdFromTokens(toks: Column): Column = {
    val langs = langStopwords.keys.toSeq.sorted
    val hits = langs.map(l => l -> langHitsFromTokens(toks, l)).toMap
    val allZero = hits.values.reduce(_ + _) === 0
    val chain = langs.init.zipWithIndex.foldLeft(when(allZero, "und")) {
      case (acc, (l, i)) =>
        val rest = langs.drop(i + 1).map(hits)
        acc.when(rest.map(r => hits(l) >= r).reduce(_ && _), l)
    }
    chain.otherwise(langs.last)
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Quality-scoring signals (length, punctuation density, stopword
    * ratio, mean word length) combined into [0,1].
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()-]", "")) /
        length(text).cast("double"))

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val en = array(langStopwords("en").map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(en, t))) /
        size(toks).cast("double"))
  }

  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, w) => acc + length(w)) /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: reasonable length band, some
    * stopwords, words neither too short nor too long, low punctuation
    * noise. Deterministic and SQL-mirrorable.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 20000), 0.25).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.01, 0.25).otherwise(0.0)
    val mwl = meanWordLen(text)
    val wordOk = when(mwl.between(2.0, 12.0), 0.25).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.1, 0.25).otherwise(0.0)
    lenOk + stopOk + wordOk + punctOk
  }

  /** Character n-gram shingles (lowercased, whitespace-collapsed). */
  def charShingles(text: Column, n: Int): Column = {
    val t = regexp_replace(lower(trim(text)), "\\s+", " ")
    val limit = greatest(length(t) - lit(n - 1), lit(1))
    array_distinct(
      transform(sequence(lit(1), limit), i => substring(t, i, lit(n))))
  }

  /** Word n-grams joined with a space. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val limit = greatest(size(toks) - lit(n - 1), lit(1))
    array_distinct(
      transform(sequence(lit(1), limit),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exact n-gram Jaccard similarity between two texts. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = wordNgrams(a, n)
    val sb = wordNgrams(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }
}
