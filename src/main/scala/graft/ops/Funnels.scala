package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel conversion over an event log (SURVEY §2.10 X123):
  * for a step sequence like view → click → purchase, a user converts
  * through step i at the EARLIEST event of that type that strictly
  * follows their step-(i−1) time — the standard product-analytics
  * funnel, which a naive per-user sort-and-scan makes a stateful
  * pass but is really a chain of conditional min-aggregations.
  *
  * Scale shape: one filtered scan per step (steps are a handful, the
  * scan prunes on `event_type`), each reduced to slim (user, ts) rows
  * by a min-aggregation BEFORE joining — every join is between
  * per-user aggregates (one row per user per side), co-partitioned on
  * the same user hash; event rows are never joined against event
  * rows. No windows, no per-user state, deterministic (min is
  * order-free).
  */
object Funnels {

  /** Per-user funnel timestamps: (user_id, ts_1 … ts_n) epoch-millis
    * per reached step (null once the funnel is abandoned), where step
    * i's time is the earliest `steps(i-1)`-typed event strictly after
    * step i−1's time.
    */
  def conversions(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val e = events.select(col(userCol).as("user_id"),
      (graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L).cast("long")
        .as("__ms"),
      col(typeCol).as("__t"))
    // step 1: earliest event of the first type, per user
    var acc = e.filter(col("__t") === steps.head)
      .groupBy(col("user_id")).agg(min(col("__ms")).as("ts_1"))
    for (i <- 2 to steps.size) {
      val prev = s"ts_${i - 1}"
      val next = e.filter(col("__t") === steps(i - 1))
        .select(col("user_id"), col("__ms"))
      acc = acc
        .join(next, Seq("user_id"), "left")
        .groupBy((col("user_id") +: (1 until i).map(j =>
          col(s"ts_$j"))): _*)
        .agg(min(when(col("__ms") > col(prev), col("__ms")))
          .as(s"ts_$i"))
    }
    acc
  }

  /** The funnel summary: one row per step with the users reaching it
    * and the conversion rate from step 1.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    val conv = conversions(events, steps, userCol, tsCol, typeCol)
    // one aggregation job for every step count (count skips nulls)
    val aggs = steps.indices.map(i => count(col(s"ts_${i + 1}")))
    val counts = conv.agg(aggs.head, aggs.tail: _*).head()
    val entered = counts.getLong(0).toDouble
    val rows = steps.indices.map { i =>
      val n = counts.getLong(i)
      (i + 1, steps(i), n, if (entered == 0) 0.0 else n / entered)
    }
    conv.sparkSession.createDataFrame(rows)
      .toDF("step", "event_type", "n_users", "rate")
  }

  /** Time-to-convert distribution per adjacent funnel step (X160):
    * the question `funnel` (how many) doesn't answer — how LONG the
    * surviving users took, step by step. One row per (i → i+1) pair
    * over users who reached step i+1: count, mean, min/max, and the
    * exact interpolated p50/p90 lags in epoch-millis deltas. The
    * slow step is the product/ops finding; a p90 collapse between
    * releases is the regression signal.
    *
    * Exactness contract: `percentile` here is Spark's EXACT
    * interpolated percentile — memory scales with the distinct lag
    * values per step pair (bounded by users, not events). That is
    * the reporting-tier choice; at full corpus scale the t-digest
    * tier ([[graft.llmops.Quantiles]]) answers the same question in
    * O(δ) per pair, mergeable. Both are exposed deliberately.
    *
    * Scale shape: inherits [[conversions]]' per-user aggregate joins;
    * the lag table is one row per converting user per pair, and the
    * stats aggregate per pair (≤ |steps|−1 output rows).
    */
  def conversionLags(events: DataFrame, steps: Seq[String],
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "need at least two funnel steps")
    val conv = conversions(events, steps, userCol, tsCol, typeCol)
    val lags = (1 until steps.size).map { i =>
      conv.filter(col(s"ts_${i + 1}").isNotNull)
        .select(lit(i).as("step"),
          lit(steps(i - 1)).as("from_type"),
          lit(steps(i)).as("to_type"),
          (col(s"ts_${i + 1}") - col(s"ts_$i")).as("lag_ms"))
    }.reduce(_ unionByName _)
    lags.groupBy(col("step"), col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_users"),
        avg(col("lag_ms")).as("mean_ms"),
        min(col("lag_ms")).as("min_ms"),
        max(col("lag_ms")).as("max_ms"),
        percentile(col("lag_ms"), lit(0.5)).as("p50_ms"),
        percentile(col("lag_ms"), lit(0.9)).as("p90_ms"))
  }
}
