package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a small target corpus. The method is three
  * relational steps, each one already scale-shaped:
  *
  *  1. '''Features''': every document reduces to counts over a fixed
  *     bucket space — unigrams and adjacent bigrams hash to a 4-hex
  *     md5 prefix (65 536 buckets), so feature rows are (id, fh, cnt)
  *     and both "models" below are bounded tables regardless of
  *     corpus vocabulary.
  *  2. '''Models''': a bag-of-hashed-n-grams multinomial each for the
  *     target and the raw corpus — ONE count aggregation per corpus
  *     (map-side partial on the bucket key; at most 65 536 rows
  *     shuffle, never text). Add-alpha smoothing keeps unseen buckets
  *     finite. The per-document importance weight is
  *     log w(x) = Σ_b c_b(x)·(log p̂_target(b) − log p̂_raw(b)),
  *     so the model the scorer needs is just the per-bucket LOG-RATIO
  *     table — broadcastable, dumpable, replayable by any engine
  *     (the q100 oracle contract).
  *  3. '''Resampling''': Gumbel-top-k over log w + g gives a sample
  *     from the softmax of the weights without normalizing (the
  *     Gumbel-max trick the paper uses). The Gumbel draw is
  *     derandomized the same way every sampler in [[Splits]] is: the
  *     uniform is the document's md5-prefix hash, g = −ln(−ln(u)), so
  *     selection is a pure function of the corpus — stable under
  *     reruns and repartitioning. The global top-k is a sort-limit,
  *     which Spark executes as TakeOrdered: per-partition bounded
  *     heaps then a k-row merge on the driver — no global sort, no
  *     wide shuffle, any corpus size.
  *
  * At 100 TB: the target corpus is small by definition (it is the
  * curated seed), the raw model is one aggregation over the crawl,
  * and scoring is explode → broadcast join → map-side-combinable sum
  * per document. Nothing corpus-sized ever moves except the slim
  * (id, fh, cnt) feature rows.
  *
  * Reference-analog note: the reference pipeline has no data-selection
  * stage (it crawls a fixed ticker list, `config.py:7-45`); DSIR is
  * part of the training-data surface this engine adds on top.
  */
object Dsir {

  /** Bucket count: 4 hex chars of md5. Shared with
    * [[QualityModel.featureKeys]]'s space so weight/ratio tables stay
    * broadcast-sized.
    */
  val Buckets = 65536

  /** Sentinel bucket key for the unseen-bucket smoothing ratio in a
    * persisted/dumped ratio table: 4 chars but not hex, so it can
    * never collide with a real md5-prefix bucket.
    */
  val DefaultKey = "dflt"

  /** Hashed n-gram feature occurrences of each document, one row per
    * occurrence: (id, fh). Unigrams and adjacent bigrams (joined with
    * a single space before hashing), COUNTED not distinct — DSIR's
    * importance weight needs multiplicities.
    */
  def featureRows(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // Two explode branches over a MATERIALIZED token array (the
    // two-stage select is deliberate: referencing the raw `tokens`
    // expression from inside the bigram lambda re-evaluates the split
    // per element_at — measured 5× slower on the whole query).
    val toks = TextFuncs.tokens(col(textCol))
    val uni = docs.select(col(idCol).as("id"),
      explode(toks).as("__t"))
      .select(col("id"), substring(md5(col("__t")), 1, 4).as("fh"))
    val bi = docs.select(col(idCol).as("id"), toks.as("__toks"))
      // sequence(1, x) with x < 1 runs DESCENDING — guard 1-token docs
      .filter(size(col("__toks")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ",
          element_at(col("__toks"), i),
          element_at(col("__toks"), i + 1)))).as("__g"))
      .select(col("id"), substring(md5(col("__g")), 1, 4).as("fh"))
    uni.unionByName(bi)
  }

  /** Per-document bucket counts (id, fh, cnt). */
  def featureCounts(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    featureRows(docs, idCol, textCol)
      .groupBy("id", "fh").agg(count(lit(1)).as("cnt"))

  /** Per-bucket log-probabilities of a smoothed hashed-n-gram
    * multinomial fit on `docs`: a (fh, lp) table over observed
    * buckets plus the default log-prob every unseen bucket shares,
    * lp = ln((c + alpha) / (total + alpha·B)).
    */
  def fitLogProbs(docs: DataFrame, alpha: Double = 1.0,
                  idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, Double) =
    // pin: ≤65 536 rows, but the subtree is a full corpus tokenize —
    // consumed by the `total` action HERE and again by every plan the
    // returned lps frame lands in (cross-action, so AQE reuse cannot
    // help)
    logProbsOf(featureRows(docs, idCol, textCol)
      .groupBy("fh").agg(count(lit(1)).as("c")), alpha)

  /** [[fitLogProbs]] over a pre-computed per-document feature-count
    * frame (a [[featureCounts]] output, typically pinned) — the
    * shared-derivation seam for the select shape, where the SAME
    * corpus must be both fitted and scored: one featureCounts pass
    * feeds the model fit here and [[importanceScoresFromCounts]],
    * instead of tokenizing the corpus once per consumer. Bit-exact
    * vs [[fitLogProbs]]: sum(cnt) per bucket over per-doc counts
    * equals count(*) per bucket over the occurrence rows (integer
    * arithmetic, order-free).
    */
  def fitLogProbsFromCounts(perDocCounts: DataFrame, alpha: Double = 1.0)
      : (DataFrame, Double) =
    logProbsOf(perDocCounts.groupBy("fh")
      .agg(sum(col("cnt")).as("c")), alpha)

  /** Shared tail of the two fit paths: pin the ≤65 536-row bucket
    * count table (it feeds the `total` action here plus every plan
    * the returned lps frame lands in) and turn it into smoothed
    * log-probs.
    */
  private def logProbsOf(bucketCounts: DataFrame, alpha: Double)
      : (DataFrame, Double) = {
    val counts = bucketCounts.localCheckpoint(false)
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)))
      .head().getLong(0).toDouble
    val denom = total + alpha * Buckets
    val lps = counts.select(col("fh"),
      log((col("c") + alpha) / denom).as("lp"))
    (lps, math.log(alpha / denom))
  }

  /** The DSIR model: per-bucket importance log-ratio
    * lr = log p̂_target − log p̂_raw over the union of buckets either
    * corpus observed, plus a [[DefaultKey]] row carrying the
    * unseen-bucket ratio. ≤65 536 rows — broadcast it, dump it, ship
    * it to another engine.
    */
  def logRatios(targetDocs: DataFrame, rawDocs: DataFrame,
                alpha: Double = 1.0, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    import targetDocs.sparkSession.implicits._
    val (tLp, tDflt) = fitLogProbs(targetDocs, alpha, idCol, textCol)
    val (rLp, rDflt) = fitLogProbs(rawDocs, alpha, idCol, textCol)
    val joined = tLp.withColumnRenamed("lp", "lpt")
      .join(rLp.withColumnRenamed("lp", "lpr"), Seq("fh"), "full_outer")
      .select(col("fh"),
        (coalesce(col("lpt"), lit(tDflt)) -
          coalesce(col("lpr"), lit(rDflt))).as("lr"))
    joined.unionByName(Seq((DefaultKey, tDflt - rDflt)).toDF("fh", "lr"))
  }

  /** [[logRatios]] from pre-computed per-document feature-count
    * frames (the [[fitLogProbsFromCounts]] seam applied to both
    * corpora). When target ⊆ raw — the q100 select shape — the caller
    * pins ONE [[featureCounts]] pass over the raw corpus and passes a
    * semi-joined slice as the target, so the corpus tokenizes once
    * for fit-target + fit-raw + scoring combined.
    */
  def logRatiosFromCounts(targetCounts: DataFrame, rawCounts: DataFrame,
                          alpha: Double = 1.0): DataFrame = {
    import targetCounts.sparkSession.implicits._
    val (tLp, tDflt) = fitLogProbsFromCounts(targetCounts, alpha)
    val (rLp, rDflt) = fitLogProbsFromCounts(rawCounts, alpha)
    val joined = tLp.withColumnRenamed("lp", "lpt")
      .join(rLp.withColumnRenamed("lp", "lpr"), Seq("fh"), "full_outer")
      .select(col("fh"),
        (coalesce(col("lpt"), lit(tDflt)) -
          coalesce(col("lpr"), lit(rDflt))).as("lr"))
    joined.unionByName(Seq((DefaultKey, tDflt - rDflt)).toDF("fh", "lr"))
  }

  /** Importance log-weight of every document under a ratio table (as
    * produced by [[logRatios]], default row included): (id, logw),
    * logw = Σ_b c_b·lr(b). One broadcast join + one partial-agg sum —
    * the raw corpus never shuffles text.
    */
  def importanceScores(docs: DataFrame, ratios: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    importanceScoresFromCounts(featureCounts(docs, idCol, textCol),
      ratios, idCol)

  /** [[importanceScores]] over a pre-computed per-document
    * feature-count frame — with [[logRatiosFromCounts]], the piece
    * that lets one pinned [[featureCounts]] pass feed model fit AND
    * scoring. Bit-exact: it is the same dataflow from the counts on.
    */
  def importanceScoresFromCounts(perDocCounts: DataFrame,
                                 ratios: DataFrame,
                                 idCol: String = "doc_id"): DataFrame = {
    // pin: the ratio table (≤65 536 rows) feeds the default-row action
    // here and the broadcast below — two actions, one derivation
    val pinned = ratios.localCheckpoint(false)
    val dflt = pinned.filter(col("fh") === DefaultKey)
      .select(col("lr")).head().getDouble(0)
    perDocCounts
      .join(broadcast(pinned.filter(col("fh") =!= DefaultKey)),
        Seq("fh"), "left")
      .groupBy(col("id"))
      .agg(sum(col("cnt") * coalesce(col("lr"), lit(dflt))).as("logw"))
      .withColumnRenamed("id", idCol)
  }

  /** Shuffle-free scalar form of the importance log-weight: the ratio
    * table rides along as a map LITERAL (the model is ≤65 536 doubles
    * — "broadcast the model" as an expression), features are hashed
    * and summed per row with higher-order functions, so scoring is a
    * pure projection — no explode, no join, no aggregation shuffle.
    * This is the form a STREAMING gate needs (append-mode legal, zero
    * state) and the cheapest batch path when only a keep-decision is
    * wanted. Bigrams pair adjacent tokens via `zip_with` over two
    * slices — NOT `element_at` inside a lambda, which would
    * re-evaluate the tokenizer per element (see [[featureRows]]).
    * Float-summation order differs from [[importanceScores]] (per
    * occurrence, in document order), so totals agree to ~1e-12
    * relative, not bit-for-bit.
    */
  def logwColumn(text: Column, ratios: Map[String, Double],
                 dflt: Double): Column = {
    val m = typedLit(ratios)
    def lr(tok: Column): Column =
      coalesce(element_at(m, substring(md5(tok), 1, 4)), lit(dflt))
    val toks = TextFuncs.tokens(text)
    val uniSum = aggregate(toks, lit(0.0), (acc, t) => acc + lr(t))
    val biSum = aggregate(
      zip_with(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      lit(0.0), (acc, g) => acc + lr(g))
    uniSum + biSum
  }

  /** A ratio DataFrame (as produced by [[logRatios]] or loaded from
    * its parquet dump) collected to the ([[logwColumn]]) literal form:
    * (bucket → lr map, default). ≤65 536 rows by construction.
    */
  def ratioMap(ratios: DataFrame): (Map[String, Double], Double) = {
    val rows = ratios.select(col("fh"), col("lr")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val dflt = rows.collectFirst { case (DefaultKey, v) => v }.getOrElse(0.0)
    (rows.toMap - DefaultKey, dflt)
  }

  /** Deterministic Gumbel draw from a content key: u = (md5-prefix
    * int + 0.5) / 65536 (the +0.5 keeps u strictly inside (0,1)),
    * g = −ln(−ln(u)).
    */
  def gumbelKey(key: Column): Column = {
    val u = (conv(substring(md5(key), 1, 4), 16, 10).cast("double") +
      lit(0.5)) / lit(65536.0)
    -log(-log(u))
  }

  /** Gumbel-top-k resampling: the k documents maximizing
    * logw + Gumbel(content) — a sample (without replacement) from
    * softmax(logw), per the Gumbel-max trick. The selection key is
    * rounded to 4 decimals with id as tiebreak so the chosen set is
    * reproducible across engines bit-for-bit; `sort → limit k`
    * executes as TakeOrdered (per-partition heaps, k-row driver
    * merge), never a global sort.
    */
  def gumbelTopK(scored: DataFrame, k: Int, keyCol: Column,
                 idCol: String = "doc_id",
                 logwCol: String = "logw"): DataFrame =
    scored
      .withColumn("sel_key", round(col(logwCol) + gumbelKey(keyCol), 4))
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(k)
}
