package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event log (SURVEY §2.10 X122):
  * users cohort by their FIRST-activity period; retention of cohort c
  * at offset k is the fraction of c's users active in period c+k —
  * the standard warehouse triangle behind every engagement dashboard.
  *
  * Scale shape: everything reduces to slim (user, period) rows first
  * — one distinct (map-side combinable) — and the user's cohort is a
  * min over the SAME user-hash shuffle, so the cohort join is
  * co-partitioned (no second exchange of the activity rows); the
  * final roll-up groups by (cohort, offset), whose cardinality is
  * O(periods²), trivially small at any event volume. No windows, no
  * per-user state.
  */
object Cohorts {

  /** The retention triangle: one row per (cohort_period,
    * period_offset) with the distinct active users, the cohort's
    * size, and the retention rate (offset 0 is 1.0 by construction).
    * Periods are `floor(epoch_ms / periodMillis)` — calendar-agnostic
    * fixed windows (pass 604800000 for weekly).
    */
  def retention(events: DataFrame, periodMillis: Long,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(periodMillis >= 1, "periodMillis must be >= 1")
    val active = events
      .select(col(userCol).as("user_id"),
        floor(graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L /
          lit(periodMillis)).cast("long").as("period"))
      .distinct()
    val cohorts = active.groupBy(col("user_id"))
      .agg(min(col("period")).as("cohort_period"))
    val counts = active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = counts.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_users").as("cohort_size"))
    counts.join(sizes, Seq("cohort_period"))
      .withColumn("retention_rate",
        col("n_users").cast("double") / col("cohort_size"))
  }
}
