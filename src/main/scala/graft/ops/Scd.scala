package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 interval compaction (SURVEY §2.10 X124): collapse a change
  * log — one row per observation of a key's attributes — into
  * slowly-changing-dimension type-2 validity intervals: one row per
  * MAXIMAL run of unchanged attributes, with `valid_from` (first
  * observation of the run) and `valid_to` (start of the next run;
  * null while current). The dimension-table build step every
  * warehouse needs in front of the as-of join (X25): joining facts
  * against raw observations explodes, joining against intervals is
  * exact.
  *
  * Scale shape: both windows partition by key (bounded by one key's
  * observation count, never global) over slim (key, ts, attrs) rows;
  * the change flag is a null-safe struct comparison against the lag,
  * the run id a running sum, the roll-up one groupBy, and `valid_to`
  * one lead over the already-compacted rows (|runs| ≤ |observations|).
  * Consecutive re-observations of identical attributes compact away —
  * the property that keeps the dimension table proportional to CHANGE
  * volume, not scan volume.
  */
object Scd {

  /** @param log     the change log (one row per observation)
    * @param attrCols the tracked attribute columns
    * @return (keyCol, attrCols…, valid_from, valid_to) epoch-micros
    *         intervals, `valid_to` null for each key's current run
    */
  def intervals(log: DataFrame, keyCol: String, tsCol: String,
                attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute")
    val attrs = struct(attrCols.map(col): _*)
    // ts ties break by the attribute tuple itself: a total order with
    // no extra id column, and same-attr ties are run-irrelevant —
    // keeps the result deterministic under repartition (the
    // Sessionize tie-break rule, expressed over what this op has)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us") +: attrCols.map(col): _*)
    val obs = log.select((col(keyCol) +:
        graft.expr.TimeFuncs.tsMicros(col(tsCol)).as("__us") +:
        attrCols.map(col)): _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || !(col("__prev") <=> attrs), 1L)
          .otherwise(0L))
      .withColumn("__run",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = obs
      .groupBy((col(keyCol) +: col("__run") +: attrCols.map(col)): _*)
      .agg(min(col("__us")).as("valid_from"))
    val wRun = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from") +: attrCols.map(col): _*)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .drop("__run")
  }

  /** Point-in-time dimension lookup (SURVEY §2.10 X133): enrich fact
    * rows with the [[intervals]] attributes valid AT each fact's
    * timestamp — `valid_from <= ts < valid_to` (open current interval
    * included; facts before a key's first interval get nulls). The
    * fact side of the X124 story: the dimension was built
    * proportional to change volume, and the lookup rides the X25
    * as-of composition — because intervals TILE each key's history,
    * "the covering interval" and "the latest interval starting at or
    * before ts" are the same row, so the join is ONE shuffle on the
    * key (union + carry-forward window), no band join, no
    * interval-explode.
    *
    * @param attrCols interval attribute columns to carry onto facts
    *                 (rename collisions on the interval side first)
    */
  def lookupJoin(facts: DataFrame, intervals: DataFrame, keyCol: String,
                 tsCol: String, attrCols: Seq[String]): DataFrame = {
    val f = facts.withColumn("__fus",
      graft.expr.TimeFuncs.tsMicros(col(tsCol)))
    // the attributes ride the as-of carry as ONE struct: the carry's
    // last(_, ignoreNulls) must treat an interval whose ATTRIBUTE is
    // null as a real observation (not see through it to the previous
    // interval), and must never mix columns from different intervals —
    // a struct row is non-null as a whole even when its fields are null
    val iv = intervals
      // an empty [T, T) interval (two same-timestamp observations
      // opened and closed it) can cover no fact and is the only way
      // two of a key's intervals share valid_from — dropping it keeps
      // the carry deterministic and matches the BETWEEN formulation
      .filter(col("valid_to").isNull ||
        col("valid_to") =!= col("valid_from"))
      .select(col(keyCol), col("valid_from"),
        struct(attrCols.map(col): _*).as("__iv_attrs"))
    AsOf.joinAsOf(f, iv,
        keys = Seq(keyCol), leftTime = "__fus",
        rightTime = "valid_from", valueCols = Seq("__iv_attrs"))
      .withColumns(attrCols.map(a =>
        a -> col("__iv_attrs").getField(a)).toMap)
      .drop("__fus", "__iv_attrs")
  }
}
