package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment analysis over event logs (X201): the two-proportion
  * z-test behind every "did the new pipeline convert better" call —
  * data-pipeline teams run these on crawl policies (render vs raw
  * fetch), dedup thresholds (did cleaning lift downstream quality),
  * and ranking variants, and the statistics are one aggregation, not
  * a notebook.
  *
  * Assignment is DETERMINISTIC hash bucketing of the unit id (the
  * q50 md5-gate discipline): the same user lands in the same arm on
  * every rerun and every table, no assignment log needed. The test
  * is the classic pooled two-proportion z:
  *
  *   z = (p̂_b − p̂_a) / sqrt( p̂(1−p̂) · (1/n_a + 1/n_b) ),
  *   p̂ pooled; |z| ≥ 1.96 ⇔ p ≤ 0.05 two-sided.
  *
  * Shape: one distinct-unit aggregate (converted = unit emitted ≥ 1
  * conversion event), one groupBy over the two arms, closed-form
  * arithmetic on a two-row frame. Nothing about the event payload
  * moves.
  */
object Experiments {

  /** Deterministic 50/50 arm assignment for a unit id: 'a' or 'b'. */
  def assignArm(unit: Column, salt: String): Column =
    when(substring(md5(concat(lit(salt), lit(":"),
      unit.cast("string"))), 1, 2) < "80", "a").otherwise("b")

  /** @return one row: (n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    *         lift, z, significant) — rates/lift/z 4dp; `significant`
    *         = |z| ≥ 1.96 (5 % two-sided); degenerate inputs (an
    *         empty arm, zero or total conversion everywhere) report
    *         z 0 and significant false rather than NaN
    */
  def abTest(events: DataFrame, conversionType: String, salt: String,
             unitCol: String = "user_id", typeCol: String = "event_type")
      : DataFrame = {
    val units = events
      .groupBy(col(unitCol).as("__u"))
      .agg(max(when(col(typeCol) === conversionType, 1L).otherwise(0L))
        .as("__conv"))
      .withColumn("__arm", assignArm(col("__u"), salt))
    // ONE unconditional aggregate row (not a per-arm filter + cross
    // join, which yields ZERO rows when an arm is empty and breaks the
    // degenerate-input promise above): a missing arm becomes n 0
    val arms = units.agg(
      coalesce(sum(when(col("__arm") === "a", 1L).otherwise(0L)), lit(0L))
        .as("n_a"),
      coalesce(sum(when(col("__arm") === "b", 1L).otherwise(0L)), lit(0L))
        .as("n_b"),
      coalesce(sum(when(col("__arm") === "a", col("__conv"))
        .otherwise(0L)), lit(0L)).as("conv_a"),
      coalesce(sum(when(col("__arm") === "b", col("__conv"))
        .otherwise(0L)), lit(0L)).as("conv_b"))
    arms
      .withColumn("rate_a", when(col("n_a") > 0,
        col("conv_a") / col("n_a").cast("double")).otherwise(lit(0.0)))
      .withColumn("rate_b", when(col("n_b") > 0,
        col("conv_b") / col("n_b").cast("double")).otherwise(lit(0.0)))
      .withColumn("__p",
        when(col("n_a") + col("n_b") > 0,
          (col("conv_a") + col("conv_b")) /
            (col("n_a") + col("n_b")).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("__se",
        when(col("n_a") > 0 && col("n_b") > 0,
          sqrt(col("__p") * (lit(1.0) - col("__p")) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .otherwise(lit(0.0)))
      .withColumn("z",
        when(col("__se") > 0.0,
          round((col("rate_b") - col("rate_a")) / col("__se"), 4))
          .otherwise(lit(0.0)))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(col("rate_a"), 4).as("rate_a"),
        round(col("rate_b"), 4).as("rate_b"),
        round(col("rate_b") - col("rate_a"), 4).as("lift"),
        col("z"), (abs(col("z")) >= 1.96).as("significant"))
  }
}
