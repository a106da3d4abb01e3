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
}
