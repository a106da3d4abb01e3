package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE-style keyword extraction (Rose et al. 2010, "Rapid Automatic
  * Keyword Extraction") — per-document multiword keyphrases with no
  * model and no corpus pass: candidate phrases are the maximal token
  * runs between stopwords/punctuation, and a phrase scores by how
  * much its words co-occur inside long candidates (degree) relative
  * to how often they appear at all (frequency). The per-document
  * counterpart of the corpus-level c-TF-IDF labels (X130): data-card
  * "what is this document about" lines, dedup-cluster naming,
  * retrieval snippets.
  *
  * Scoring — the POOLED ratio, deliberately: canonical RAKE sums
  * per-word deg(w)/freq(w) quotients, a float whose summation order
  * is engine-dependent (ULP drift under repartitioning, rank flips at
  * ties). Here score(phrase) = Σ deg(w) / Σ freq(w) over member
  * occurrences — ONE division of two exact integers, so the double is
  * bit-identical on any engine and the (score desc, phrase asc) rank
  * is deterministic everywhere. deg(w) counts the full length of each
  * candidate containing w (self included, the standard self-loop
  * convention); both stats are per-document.
  *
  * Scale shape: tokens explode once; phrase grouping is one
  * cumulative-sum window per doc over slim token rows (the
  * sessionize arrangement); stats and scores are per-(doc, word) and
  * per-(doc, phrase) aggregations; the final top-k rank window rides
  * the X46 WindowGroupLimit rewrite. Nothing global, nothing
  * collected.
  */
object Keywords {

  /** The default phrase-boundary stopword list: the X13 `en` set plus
    * the high-frequency function words a usable RAKE needs (RAKE's
    * quality IS its stoplist; callers with a domain list pass their
    * own).
    */
  val defaultStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "a", "in", "is", "that",
    "it", "for", "on", "with", "as", "by", "at", "an",
    "be", "this", "are", "was", "or", "from", "but", "not",
    "have", "has", "had", "they", "you", "we", "his", "her",
    "its", "their", "which", "will", "would", "can", "could", "been")

  /** Top-`k` keyphrases per document: (idCol, rank, phrase, n_words,
    * score). A token whose stripped form (`[^a-z0-9']` removed) is
    * empty or a stopword is a boundary; a token with trailing
    * sentence punctuation closes its phrase after itself; runs longer
    * than `maxPhraseWords` are not candidates (and do not feed the
    * word stats). Documents with no candidate phrase emit no row.
    */
  def rakeKeywords(docs: DataFrame, k: Int = 5, maxPhraseWords: Int = 4,
                   stopwords: Seq[String] = defaultStopwords,
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxPhraseWords >= 1, "maxPhraseWords must be >= 1")
    require(stopwords.nonEmpty, "RAKE without a stoplist is one giant phrase")
    val sw = array(stopwords.map(lit): _*)
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "raw")))
      .filter(col("raw") =!= "")
      .withColumn("w", regexp_replace(col("raw"), "[^a-z0-9']", ""))
      .withColumn("brk",
        col("w") === "" || array_contains(sw, col("w")))
      .withColumn("endp", col("raw").rlike("[.,;:!?]$"))
    val wAll = Window.partitionBy(col("id")).orderBy(col("pos"))
    val grouped = toks
      .withColumn("g",
        sum(when(col("brk"), 1L).otherwise(0L)).over(wAll) +
          coalesce(sum(when(col("endp"), 1L).otherwise(0L))
            .over(wAll.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      .filter(!col("brk"))
      .select(col("id"), col("g"), col("pos"), col("w"))
    val phrases = grouped.groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("len"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w")), " ").as("phrase"))
      .filter(col("len") <= maxPhraseWords)
    val members = grouped.join(phrases, Seq("id", "g"))
    val wordStats = members.groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
    val perOcc = members.join(wordStats, Seq("id", "w"))
      .groupBy(col("id"), col("g"), col("phrase"), col("len"))
      .agg(sum(col("deg")).as("sdeg"), sum(col("freq")).as("sfreq"))
    val perPhrase = perOcc.groupBy(col("id"), col("phrase"))
      .agg(max(col("len")).as("n_words"),
        // identical text ⇒ identical integer sums; max = the value
        max(col("sdeg")).as("sdeg"), max(col("sfreq")).as("sfreq"))
      .withColumn("score", col("sdeg").cast("double") / col("sfreq"))
    val wRank = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("phrase"))
    perPhrase
      .withColumn("rank", rank().over(wRank))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("rank"), col("phrase"),
        col("n_words"), col("score"))
  }

  /** Prefix → top-k completions from a query log (X169): the
    * autocomplete table — for every character prefix (length 1 to
    * `maxPrefixLen`) of every logged query, the k most frequent full
    * queries under it, ranked (count desc, query asc). Built offline
    * as a plain table, served by a prefix point-lookup; the same
    * shape ranks "what do people search after typing 'spar'" for
    * query-intent analysis over the retrieval tier's query logs.
    *
    * Scale shape: queries dedupe to (q, n) FIRST (the log collapses
    * to distinct queries before any explosion), each query then
    * explodes to ≤ maxPrefixLen slim prefix rows, and the per-prefix
    * rank rides the X46 WindowGroupLimit — nothing beyond k rows per
    * prefix survives the partial aggregation.
    */
  def prefixCompletions(queries: DataFrame, maxPrefixLen: Int = 10,
                        k: Int = 5, queryCol: String = "q")
      : DataFrame = {
    require(maxPrefixLen >= 1 && k >= 1, "maxPrefixLen and k must be >= 1")
    val counts = queries
      .select(lower(trim(col(queryCol))).as("q"))
      .filter(length(col("q")) > 0)
      .groupBy(col("q")).agg(count(lit(1)).as("n"))
    val prefixed = counts.select(col("q"), col("n"),
        explode(transform(
          sequence(lit(1), least(length(col("q")), lit(maxPrefixLen))),
          i => col("q").substr(lit(1), i))).as("prefix"))
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("n").desc, col("q"))
    prefixed
      .withColumn("rank", rank().over(w))
      .filter(col("rank") <= k)
      .select(col("prefix"), col("rank"), col("q").as("completion"),
        col("n"))
  }

  /** TextRank keywords (X193; Mihalcea & Tarau 2004): per-document
    * PageRank over the word co-occurrence graph — the GRAPH
    * counterpart of [[rakeKeywords]]' frequency statistics: RAKE
    * scores words by the company they keep inside candidate phrases,
    * TextRank by their centrality in the whole document's
    * co-occurrence structure, which surfaces connective vocabulary
    * RAKE's stopword-bounded phrases never see. Both are per-document
    * and model-free; run both and diff when labeling matters.
    *
    * Construction, stated exactly for the oracle: vertices = the
    * document's distinct tokens of length ≥ `minLen`; undirected
    * edges = distinct unordered token pairs co-occurring within
    * `windowSize` positions (parallel pairs collapse — the standard
    * unweighted formulation); rank = `iterations` synchronous rounds
    * of r ← (1−d) + d·Σ r(u)/deg(u) from r₀ = 1, exactly
    * [[graft.ops.PageRank]]'s update with every quantity keyed by
    * (doc, token). Ties rank alphabetically.
    *
    * Scale shape: ALL documents' graphs are one edge table keyed
    * (doc, u, v) — per-round cost is `iterations` slim joins on the
    * (doc, token) composite key, never a per-document loop; the
    * final top-k rides the X46 rank-window rewrite.
    */
  def textrankKeywords(docs: DataFrame, k: Int = 5, windowSize: Int = 2,
                       iterations: Int = 2, damping: Double = 0.85,
                       minLen: Int = 3, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(k >= 1 && windowSize >= 1 && iterations >= 1,
      "k, windowSize, iterations must be >= 1")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(TextFuncs.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .filter(length(col("term")) >= minLen)
    // co-occurrence within windowSize: |pos_a - pos_b| <= w via w
    // shifted equi-joins (a theta band join would be quadratic)
    val edges = (1 to windowSize).map { off =>
      toks.select(col("id"), col("pos"), col("term").as("a"))
        .join(toks.select(col("id"), (col("pos") - off).as("pos"),
          col("term").as("b")), Seq("id", "pos"))
        .filter(col("a") =!= col("b"))
        .select(col("id"), least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
    }.reduce(_ unionByName _).distinct().localCheckpoint(true)
    val sym = edges.unionByName(
      edges.select(col("id"), col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("id"), col("u"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val nodes = deg.select(col("id"), col("u").as("term"))
    var ranks = nodes.select(col("id"), col("term"),
      lit(1.0).as("r")).localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contrib = sym
        .join(ranks.select(col("id"), col("term").as("u"), col("r")),
          Seq("id", "u"))
        .join(deg, Seq("id", "u"))
        .groupBy(col("id"), col("v"))
        .agg(sum(col("r") / col("deg")).as("m"))
      ranks = nodes
        .join(contrib.select(col("id"), col("v").as("term"), col("m")),
          Seq("id", "term"), "left")
        .select(col("id"), col("term"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    // rank on the ROUNDED score (the rankTail discipline): float
    // summation order differs across engines/partitionings, and a
    // raw-double orderBy would flip ULP-close ranks; 4dp ties break
    // alphabetically, deterministic everywhere
    val w = Window.partitionBy(col("id"))
      .orderBy(col("rank").desc, col("term"))
    ranks
      .withColumn("rank", round(col("r"), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id").as(idCol), col("rk"), col("term"), col("rank"))
  }
}
