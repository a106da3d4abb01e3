package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based corpus mixing — the multilingual/multi-source
  * sampling rule from mT5/XLM-R (and the Pile's per-source epochs):
  * sample source s with probability ∝ n_s^α where n_s is its token
  * count, α ∈ (0, 1] flattening the head so small sources aren't
  * drowned (α = 1 is proportional, α → 0 uniform). Given a token
  * budget B the per-source quota is B·w_s, realized as either a
  * downsample rate (< 1) or repetition epochs (> 1) — the "web gets
  * 0.4 epochs, books get 3" table every LLM data card publishes.
  *
  * Everything is one aggregation over the corpus (per-source token
  * sums — map-side combinable, |sources| rows shuffle) followed by a
  * |sources|-row table computation; application is a broadcast join
  * of that table plus the same deterministic md5-uniform keep
  * predicate as [[Splits.sampleHash]] — a pure per-row function of
  * content, stable under reruns, repartitioning, and appends. The
  * rates are rounded to 6 decimals BEFORE the keep comparison so the
  * decision replays identically in any engine (the q101 oracle
  * recomputes every fate in DuckDB).
  *
  * Reference-analog note: the reference has a fixed company list and
  * no notion of source weighting (`config.py:7-45`); mixture building
  * is part of the training-data surface this engine adds.
  */
object Mixture {

  /** Per-source mixture table: (source, n_docs, n_tokens, weight,
    * rate, epochs) where weight = n_tokens^α / Σ n_tokens^α,
    * quota = budget·weight, epochs = quota / n_tokens and
    * rate = min(1, epochs). |sources| rows — broadcast-sized by
    * construction. weight/rate/epochs are rounded to 6 decimals
    * (determinism contract above).
    */
  def temperatureWeights(docs: DataFrame, alpha: Double,
                         tokenBudget: Long,
                         sourceCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFuncs.tokenCount(col(textCol))).as("n_tokens"))
    // the normalizer is one double over the |sources|-row frame —
    // aggregate it separately and broadcast it back rather than a
    // global window (same trick as Binning's thresholds)
    val denom = counts.agg(
      sum(pow(col("n_tokens").cast("double"), alpha)).as("__z"))
    counts.crossJoin(broadcast(denom))
      .withColumn("weight",
        round(pow(col("n_tokens").cast("double"), alpha) / col("__z"), 6))
      .withColumn("epochs",
        round(lit(tokenBudget.toDouble) * col("weight") /
          col("n_tokens"), 6))
      .withColumn("rate", least(lit(1.0), col("epochs")))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("weight"), col("rate"), col("epochs"))
  }

  /** Apply a mixture table: every document joins its source's rate
    * (broadcast — the table is |sources| rows) and keeps iff its
    * md5-uniform falls under it. Returns `docs` plus `keep`.
    */
  def applyRates(docs: DataFrame, rates: DataFrame,
                 sourceCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val u = conv(substring(md5(col(textCol)), 1, 4), 16, 10)
      .cast("double") / lit(65536.0)
    docs.join(broadcast(rates.select(col(sourceCol), col("rate"))),
        Seq(sourceCol), "left")
      .withColumn("keep", u < coalesce(col("rate"), lit(0.0)))
      .drop("rate")
  }

  /** Budget-constrained quality-greedy mixture: when the token budget
    * is a hard cap and per-source quality is measurable, fill the
    * budget best-source-first — sources ordered by mean heuristic
    * quality desc (ties by source asc), each allocated
    * min(its tokens, maxShare·budget, remaining budget) until the
    * budget is spent. `maxShare` caps any one source's share (the
    * anti-monoculture guard every curated mixture applies). The greedy
    * is RELATIONAL: because every source before the budget boundary
    * takes its full cap, Σ previous allocations = min(budget,
    * running cap sum), so alloc_i = min(cap_i, max(0, budget − cap
    * cumsum before i)) — one cumulative-sum window over the
    * |sources|-row aggregate (construction-bounded, like Binning's
    * thresholds), all integer arithmetic, no iteration.
    *
    * Returns (source, n_docs, n_tokens, quality, alloc_tokens, rate)
    * with rate = alloc/n_tokens ∈ [0, 1] rounded to 6 decimals,
    * ready for [[applyRates]].
    */
  def budgetAllocate(docs: DataFrame, tokenBudget: Long,
                     maxShare: Double = 1.0,
                     sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    require(tokenBudget >= 0, "tokenBudget must be non-negative")
    require(maxShare > 0.0 && maxShare <= 1.0,
      "maxShare must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val stats = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFuncs.tokenCount(col(textCol))).as("n_tokens"),
        round(avg(TextFuncs.qualityScore(col(textCol))), 6).as("quality"))
    val perSourceCap = math.floor(maxShare * tokenBudget).toLong
    val w = Window.orderBy(col("quality").desc, col(sourceCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    stats
      .withColumn("__cap", least(col("n_tokens"), lit(perSourceCap)))
      .withColumn("__before", coalesce(sum(col("__cap")).over(w), lit(0L)))
      .withColumn("alloc_tokens",
        least(col("__cap"),
          greatest(lit(0L), lit(tokenBudget) - col("__before"))))
      .withColumn("rate",
        when(col("n_tokens") > 0,
          round(col("alloc_tokens").cast("double") /
            col("n_tokens").cast("double"), 6)).otherwise(lit(0.0)))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("quality"), col("alloc_tokens"), col("rate"))
  }
}
