package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the classifier stage of the standard
  * web-corpus pipeline (GPT-3 / CCNet practice: score every document
  * with a trained quality model, keep by threshold or importance-
  * sample by score), distinct from [[TextFuncs.qualityScore]]'s fixed
  * heuristic. The model is logistic regression over hashed
  * bag-of-words features: distinct lowercased tokens hash to a 4-hex-
  * char md5 prefix (65 536 buckets), so the whole weight table is
  * bounded and broadcastable regardless of corpus vocabulary.
  *
  * Training is batch gradient descent where each epoch is ONE slim
  * shuffle, nothing more: the per-doc margin is a pure projection
  * (the ≤65 536-entry weight table ships as a map literal and the
  * cached feature arrays fold over it — the [[Dsir.logwColumn]]
  * scalar-kernel move), so residuals materialize in the same map
  * task as the features, and the only exchange is the per-feature
  * gradient aggregation — at most 65 536 (hash, grad) doubles reach
  * the driver per epoch, invariant in corpus size. Text is tokenized
  * once into the cached feature frame; at 100 TB train on a sample
  * (quality models are sample-trained in practice) and score the
  * full corpus with [[score]], which is one broadcast join + one
  * map-side-combinable sum per document.
  *
  * Scoring is deliberately pure dataflow (explode → broadcast join →
  * sum → sigmoid), so a dumped weight table lets any engine replay
  * every score exactly — the q97 oracle contract.
  */
object QualityModel {

  /** Bias row sentinel in a persisted weight table: 'bias' is 4 chars
    * but not hex, so it can never collide with an md5-prefix feature.
    */
  val BiasKey = "bias"

  /** Distinct hashed token features of a document: lowercase
    * whitespace tokens → first 4 md5 hex chars. Distinct BEFORE and
    * AFTER hashing: a document contributes each feature bucket once.
    */
  def featureKeys(text: Column): Column =
    array_distinct(transform(
      array_distinct(TextFuncs.tokens(text)),
      t => substring(md5(t), 1, 4)))

  /** Train logistic-regression weights against a 0/1 `labelCol`.
    * Returns the weight map (feature hash → weight) plus bias.
    * Deterministic per run up to float summation order; the dump-and-
    * replay contract never depends on bit-identical retraining.
    */
  def train(docs: DataFrame, labelCol: String = "label",
            idCol: String = "doc_id", textCol: String = "text",
            epochs: Int = 8, lr: Double = 4.0)
      : (Map[String, Double], Double) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the bias is an always-on synthetic feature appended to every
    // doc's feature array: ONE gradient aggregation per epoch covers
    // weights AND bias. BiasKey can never collide with a real
    // md5-prefix bucket (not hex).
    val base = docs.select(col(idCol).as("id"),
        col(labelCol).cast("double").as("y"),
        concat(coalesce(featureKeys(col(textCol)),
          array().cast("array<string>")), array(lit(BiasKey))).as("fhs"))
      .cache()
    val n = base.count().toDouble
    if (n == 0) { base.unpersist(); return (Map.empty, 0.0) }
    var weights = Map.empty[String, Double] // includes BiasKey
    var epoch = 0
    while (epoch < epochs) {
      // margin as a pure projection over the weight map literal: the
      // residual is computed in the same map task that holds the
      // feature array, so the epoch's ONLY exchange is the ≤65 536-row
      // per-feature gradient agg (map-side combined). CPU tradeoff:
      // Catalyst's GetMapValue linear-scans a literal map's keys, so
      // each epoch costs O(tokens × |weights|) comparisons map-side —
      // cheap at the sample-train sizes this is documented for (train
      // on a sample, score the corpus with the fixed weight map), but
      // near the 65,536-bucket fill a broadcast hash join on fh would
      // trade the shuffle back for O(1) lookups.
      val margin =
        if (weights.isEmpty) lit(0.0)
        else {
          val wm = typedLit(weights)
          aggregate($"fhs", lit(0.0),
            (acc, fh) => acc + coalesce(element_at(wm, fh), lit(0.0)))
        }
      val grad = base
        .select(($"y" - lit(1.0) / (lit(1.0) + exp(-margin))).as("negr"),
          $"fhs")
        .select(explode($"fhs").as("fh"), $"negr")
        .groupBy($"fh").agg(sum($"negr").as("ng"))
        .as[(String, Double)].collect()
      weights = weights ++ grad.map { case (fh, ng) =>
        fh -> (weights.getOrElse(fh, 0.0) + lr * ng / n)
      }
      epoch += 1
    }
    base.unpersist()
    (weights - BiasKey, weights.getOrElse(BiasKey, 0.0))
  }

  /** Weight map (+ bias row) as a DataFrame in the persisted/dumped
    * table shape (fh, w).
    */
  def weightsTable(docs: DataFrame, weights: Map[String, Double],
                   bias: Double): DataFrame = {
    import docs.sparkSession.implicits._
    (weights.toSeq :+ (BiasKey -> bias)).toDF("fh", "w")
  }

  /** Score every document: prob = sigmoid(bias + Σ w(feature)).
    * Returns (idCol, prob). One broadcast join + one partial-agg sum
    * per document — the corpus never shuffles text or full vectors.
    */
  def score(docs: DataFrame, weights: Map[String, Double], bias: Double,
            idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = if (weights.isEmpty) Seq.empty[(String, Double)].toDF("fh", "w")
      else weights.toSeq.toDF("fh", "w")
    docs.select(col(idCol),
        explode_outer(featureKeys(col(textCol))).as("fh"))
      .join(broadcast(wDf), Seq("fh"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(0.0))).as("s"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("s") + bias)))).as("prob"))
  }

  /** Precision-recall threshold sweep (SURVEY §2.10 X129) — the
    * calibration artifact behind every quality-gate decision: a
    * trained scorer is only useful once its threshold is CHOSEN, and
    * choosing needs precision/recall/F1 at every candidate cutoff.
    * The classic formulation (sort all scores, cumulate) is a global
    * sort; this one is a fixed threshold grid instead: each row
    * buckets to `floor(prob·nBins)` (top-clamped) in one pass, one
    * groupBy reduces the corpus to ≤ nBins (count, positives) rows,
    * and the cumulative-from-the-top sweep runs over that bounded
    * frame — the unpartitioned window is over ≤ nBins PRE-AGGREGATED
    * rows, a construction bound, never corpus rows. Threshold t_b =
    * b/nBins counts exactly the rows with prob ≥ t_b (bin floors
    * align with the grid).
    *
    * @return one row per non-empty bin, threshold descending:
    *         (threshold, pred_pos, tp, precision, recall, f1)
    */
  def prCurve(scored: DataFrame, labelCol: String = "label",
              probCol: String = "prob", nBins: Int = 100): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val binned = scored.select(
        least(floor(col(probCol) * nBins), lit(nBins - 1)).cast("int")
          .as("bin"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__npos"))
    // ≤ nBins rows from here on — every window/cross below is bounded
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = binned.agg(sum(col("__npos")).as("__p"))
    binned
      .withColumn("pred_pos", sum(col("__n")).over(w))
      .withColumn("tp", sum(col("__npos")).over(w))
      .crossJoin(broadcast(totals))
      .select(
        (col("bin").cast("double") / nBins).as("threshold"),
        col("pred_pos"), col("tp"),
        (col("tp").cast("double") / col("pred_pos")).as("precision"),
        // zero-positive batches (a real state early in labeling)
        // define recall as 0, not a silent null column
        when(col("__p") > 0, col("tp").cast("double") / col("__p"))
          .otherwise(lit(0.0)).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** Calibration / reliability report (X187): is a probability of 0.8
    * RIGHT 80 % of the time? A gate like `prob >= minQuality` embeds
    * that assumption — an over-confident model silently shifts the
    * effective threshold, and no accuracy metric catches it
    * (Guo et al. 2017, "On Calibration of Modern Neural Networks").
    * Same bounded construction as [[prCurve]]: bin to
    * `floor(prob·nBins)`, one groupBy to ≤ nBins rows, everything
    * after runs on that bounded frame.
    *
    * @return one row per non-empty bin, ascending: (bin_lo, n,
    *         avg_prob, frac_pos, gap, ece_contrib) — `gap` =
    *         |avg_prob − frac_pos| (4dp), `ece_contrib` = gap·n/N;
    *         the Expected Calibration Error is their sum (every row
    *         carries it as `ece`, constant by construction, so the
    *         scalar travels with the frame).
    */
  def calibrationReport(scored: DataFrame, labelCol: String = "label",
                        probCol: String = "prob", nBins: Int = 10)
      : DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val binned = scored.select(
        least(floor(col(probCol) * nBins), lit(nBins - 1)).cast("int")
          .as("bin"),
        col(probCol).cast("double").as("__p"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), avg(col("__p")).as("avg_prob"),
        avg(col("__y").cast("double")).as("frac_pos"))
    val totals = binned.agg(
      sum(col("n")).as("__total"),
      sum(abs(col("avg_prob") - col("frac_pos")) * col("n")).as("__gapsum"))
    binned.crossJoin(broadcast(totals))
      .select(
        (col("bin").cast("double") / nBins).as("bin_lo"),
        col("n"),
        round(col("avg_prob"), 4).as("avg_prob"),
        round(col("frac_pos"), 4).as("frac_pos"),
        round(abs(col("avg_prob") - col("frac_pos")), 4).as("gap"),
        round(abs(col("avg_prob") - col("frac_pos")) * col("n") /
          col("__total"), 4).as("ece_contrib"),
        round(col("__gapsum") / col("__total"), 4).as("ece"))
  }
}
