package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection (SURVEY §2.10 X136): bucket the event
  * log into fixed windows per series, score each bucket's count
  * against the TRAILING `lookback` buckets (z-score over their sample
  * mean/stddev — strictly past-only, so the detector is causal and a
  * burst cannot suppress its own alarm), and flag |z| ≥ threshold.
  * The ops-monitoring staple over the same table the engine already
  * sessionizes and funnels.
  *
  * Scale shape: the corpus reduces to slim (series, bucket, n) rows
  * in one aggregation; the trailing statistics are per-series windows
  * over those bucket rows (bounded by a series' bucket count, never
  * events); missing trailing history (fewer than `minHistory` prior
  * buckets) yields z = null rather than a fake score. Gaps (empty
  * buckets) are genuinely absent rows — the trailing frame sees
  * observed buckets, the documented semantics (densifying zeros is a
  * caller choice: join a bucket spine first).
  */
object Anomaly {

  /** @return (seriesCol, bucket, n, trail_mean, trail_std, z,
    *         is_anomaly) — one row per observed (series, bucket)
    */
  def rateAnomalies(events: DataFrame, bucketMillis: Long,
                    lookback: Int = 24, threshold: Double = 3.0,
                    minHistory: Int = 3,
                    seriesCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    require(lookback >= minHistory && minHistory >= 2,
      "need lookback >= minHistory >= 2 buckets of trailing history")
    val counts = events
      .select(col(seriesCol),
        floor(graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L /
          lit(bucketMillis)).cast("long").as("bucket"))
      .groupBy(col(seriesCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("__tn", count(col("n")).over(w))
      .withColumn("trail_mean", avg(col("n")).over(w))
      .withColumn("trail_std", stddev_samp(col("n")).over(w))
      .withColumn("z",
        when(col("__tn") >= minHistory && col("trail_std") > 0.0,
          (col("n") - col("trail_mean")) / col("trail_std")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) >= threshold, lit(false)))
      .drop("__tn")
  }

  /** Single change-point detection (X219) per series: the bucket
    * AFTER which the series' level shifted most, by the least-squares
    * two-segment criterion — maximize the between-segment sum of
    * squares `s·(T−s)/T · (mean_before − mean_after)²` over all
    * splits `s` (the k=1 case of binary segmentation; Scott & Knott
    * 1974 lineage). Where [[rateAnomalies]] flags single weird
    * buckets against trailing history, this answers "WHEN did the
    * level change" — the question behind crawl-policy rollouts and
    * source-mix changes.
    *
    * Exact and replayable: per-series bucket counts (observed buckets
    * only — the [[rateAnomalies]] convention), one ordered cumulative
    * window per series, closed-form segment means from cumsums, and
    * the argmax breaks ties on the EARLIEST bucket after a 4dp round.
    * Shape: one groupBy + one window per series key; a series' bucket
    * count is small (time, not corpus, sized) so the per-series
    * window partition is bounded.
    *
    * @return one row per series: (seriesCol, split_bucket = last
    *         bucket of the left segment, n_before, n_after,
    *         mean_before, mean_after, score) — means/score 4dp;
    *         series with < 2 buckets yield no row (no split exists)
    */
  def changePoint(events: DataFrame, bucketMillis: Long,
                  seriesCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    val counts = events
      .select(col(seriesCol),
        floor(graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L /
          lit(bucketMillis)).cast("long").as("bucket"))
      .groupBy(col(seriesCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col(seriesCol))
    val scored = counts
      .withColumn("__idx", row_number().over(w).cast("long"))
      .withColumn("__cum",
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__T", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .where(col("__idx") < col("__T"))
      .withColumn("mean_before",
        col("__cum") / col("__idx").cast("double"))
      .withColumn("mean_after",
        (col("__tot") - col("__cum")) /
          (col("__T") - col("__idx")).cast("double"))
      .withColumn("score", round(
        col("__idx") * (col("__T") - col("__idx")) /
          col("__T").cast("double") *
          pow(col("mean_before") - col("mean_after"), 2.0), 4))
    val pick = Window.partitionBy(col(seriesCol))
      .orderBy(col("score").desc, col("bucket"))
    scored
      .withColumn("__rk", row_number().over(pick))
      .where(col("__rk") === 1)
      .select(col(seriesCol), col("bucket").as("split_bucket"),
        col("__idx").as("n_before"),
        (col("__T") - col("__idx")).as("n_after"),
        round(col("mean_before"), 4).as("mean_before"),
        round(col("mean_after"), 4).as("mean_after"),
        col("score"))
  }

  /** LOWER median (element ⌈len/2⌉ of the sorted array, 1-based):
    * integer-exact on integer inputs — the reason the robust scorer
    * stays bit-replayable where a fractional even-count median would
    * reopen float drift.
    */
  private def lowerMedian(arr: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val s = array_sort(arr)
    element_at(s, floor((size(s).cast("double") + 1.0) / 2.0).cast("int"))
  }

  /** Robust variant of [[rateAnomalies]]: trailing MEDIAN/MAD instead
    * of mean/stddev, so a burst inside the lookback window cannot
    * inflate the scale estimate and mask the next burst (the classic
    * z-score failure: one 10× spike raises stddev enough to hide a 5×
    * spike an hour later; the median absolute deviation has a 50%
    * breakdown point). Score = (n − med) / (1.4826·MAD), the standard
    * consistency constant; threshold 3.5 is the Iglewicz-Hoberg
    * convention. MAD = 0 (≥ half the trailing buckets identical)
    * yields z = null — "no scale estimate", not a fake infinity.
    *
    * Scale shape: same slim (series, bucket, n) reduction; the
    * trailing frame materializes as a ≤ `lookback`-element array per
    * bucket row (collect_list over the window — bounded by
    * construction), and median/MAD are array HOFs on it, so the
    * whole scorer stays relational and oracle-replayable.
    */
  def robustRateAnomalies(events: DataFrame, bucketMillis: Long,
                          lookback: Int = 24, threshold: Double = 3.5,
                          minHistory: Int = 3,
                          seriesCol: String = "event_type",
                          tsCol: String = "ts"): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    require(lookback >= minHistory && minHistory >= 2,
      "need lookback >= minHistory >= 2 buckets of trailing history")
    val counts = events
      .select(col(seriesCol),
        floor(graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L /
          lit(bucketMillis)).cast("long").as("bucket"))
      .groupBy(col(seriesCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("__hist", collect_list(col("n")).over(w))
      // empty trailing frame (a series' first bucket) → null med/mad,
      // not an element_at(_, 0) error
      .withColumn("trail_med",
        when(size(col("__hist")) > 0, lowerMedian(col("__hist"))))
      .withColumn("trail_mad",
        when(size(col("__hist")) > 0,
          lowerMedian(transform(col("__hist"),
            x => abs(x - col("trail_med"))))))
      .withColumn("z",
        when(size(col("__hist")) >= minHistory && col("trail_mad") > 0L,
          (col("n") - col("trail_med")).cast("double") /
            (lit(1.4826) * col("trail_mad").cast("double"))))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) >= threshold, lit(false)))
      .drop("__hist")
  }

  /** Seasonal variant of [[rateAnomalies]] (X168): each bucket is
    * scored against the trailing buckets of the SAME PHASE —
    * `bucket % period` — so a daily bucketing with period = 7
    * compares Mondays with past Mondays. The plain trailing window
    * fails twice on cyclic traffic: the weekday/weekend swing
    * inflates the trailing stddev (burying real bursts), and every
    * Monday morning looks like an anomaly against a trailing frame
    * full of Sunday. Scoring, null contracts, and minHistory match
    * [[rateAnomalies]] exactly; only the window's partition key
    * changes — which is also why it replays in SQL untouched.
    *
    * @return (seriesCol, bucket, phase, n, trail_mean, trail_std, z,
    *         is_anomaly) — one row per observed (series, bucket)
    */
  def seasonalRateAnomalies(events: DataFrame, bucketMillis: Long,
                            period: Int, lookback: Int = 8,
                            threshold: Double = 3.0,
                            minHistory: Int = 3,
                            seriesCol: String = "event_type",
                            tsCol: String = "ts"): DataFrame = {
    require(bucketMillis >= 1, "bucketMillis must be >= 1")
    require(period >= 2, "period must be >= 2 buckets (else use the " +
      "plain trailing window)")
    require(lookback >= minHistory && minHistory >= 2,
      "need lookback >= minHistory >= 2 same-phase trailing buckets")
    val counts = events
      .select(col(seriesCol),
        floor(graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L /
          lit(bucketMillis)).cast("long").as("bucket"))
      .groupBy(col(seriesCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("phase", pmod(col("bucket"), lit(period.toLong)))
    val w = Window.partitionBy(col(seriesCol), col("phase"))
      .orderBy(col("bucket")).rowsBetween(-lookback, -1)
    counts
      .withColumn("__tn", count(col("n")).over(w))
      .withColumn("trail_mean", avg(col("n")).over(w))
      .withColumn("trail_std", stddev_samp(col("n")).over(w))
      .withColumn("z",
        when(col("__tn") >= minHistory && col("trail_std") > 0.0,
          (col("n") - col("trail_mean")) / col("trail_std")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) >= threshold, lit(false)))
      .drop("__tn")
  }
}
