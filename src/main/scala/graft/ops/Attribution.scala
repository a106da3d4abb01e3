package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing/engagement attribution over an event log: for every
  * conversion event, which touch event gets the credit — the FIRST
  * touch inside the lookback window (discovery credit) and the LAST
  * touch before converting (closer credit). The per-channel credit
  * report is the number a mixing/budget decision actually consumes,
  * same shape as [[Funnels]]' conversion counts.
  *
  * Declarative single-pass shape: one window per user ordered by
  * event-time MILLISECONDS with a RANGE frame of `lookbackMillis` —
  * every conversion row reads its first/last qualifying touch as a
  * `min`/`max` of a `(ms, event_id)` struct (null for non-touch rows;
  * min/max skip nulls), so the whole computation is ONE shuffle on
  * the uniform user key and never self-joins the event log. Ties at
  * the same millisecond break on event_id — deterministic, and the
  * struct comparison is exactly the (ts, id) lexicographic order the
  * oracle replays (q209).
  *
  * Scale: the window state per user is O(events in the lookback) and
  * AQE handles user skew; contrast with the conversions×touches
  * range self-join, which re-shuffles the log per conversion and
  * explodes on power users.
  */
object Attribution {

  /** Per-conversion touch picks: (user, conversion_event_id,
    * conversion_ms, first_touch_event_id, last_touch_event_id) —
    * touch ids null when no touch fell inside the lookback.
    */
  def touches(events: DataFrame, touchTypes: Seq[String],
              conversionType: String, lookbackMillis: Long,
              userCol: String = "user_id", tsCol: String = "ts",
              typeCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(lookbackMillis > 0, "lookbackMillis must be positive")
    // twins' contract with [[graft.streaming.EventStreams
    // .attributionStream]]: if the conversion type were also a touch
    // type, this RANGE frame (which ends AT the conversion row) would
    // credit the conversion itself while the stream appends touches
    // after emitting — forbid the overlap in both rather than diverge
    require(!touchTypes.contains(conversionType),
      s"conversionType '$conversionType' must not also be a touch type")
    // tsMicros handles TIMESTAMP and TIMESTAMP_NTZ alike (unix_millis
    // rejects NTZ, which is what parquet event logs load as)
    val ms = (graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L)
      .cast("long")
    val touch: Column = when(col(typeCol).isin(touchTypes: _*),
      struct(ms.as("ms"), col(idCol).cast("long").as("id")))
    val w = Window.partitionBy(col(userCol)).orderBy(ms)
      .rangeBetween(-lookbackMillis, 0)
    events
      .withColumn("__first", min(touch).over(w))
      .withColumn("__last", max(touch).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(userCol).as("user_id"),
        col(idCol).cast("long").as("conversion_event_id"),
        ms.as("conversion_ms"),
        col("__first.id").as("first_touch_event_id"),
        col("__last.id").as("last_touch_event_id"))
  }

  /** Credit report: conversions per (model, touch type), models
    * "first" and "last"; conversions whose lookback held no touch
    * land on touch_type "(none)". Shares sum to 1 per model.
    */
  def report(events: DataFrame, touchTypes: Seq[String],
             conversionType: String, lookbackMillis: Long,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    val picks = touches(events, touchTypes, conversionType, lookbackMillis,
      userCol, tsCol, typeCol, idCol)
    val types = events.select(col(idCol).cast("long").as("tid"),
      col(typeCol).as("touch_type"))
    def side(model: String, pick: String): DataFrame =
      picks.join(types, picks(pick) === types("tid"), "left")
        .select(lit(model).as("model"),
          coalesce(col("touch_type"), lit("(none)")).as("touch_type"))
    val both = side("first", "first_touch_event_id")
      .unionByName(side("last", "last_touch_event_id"))
      .groupBy(col("model"), col("touch_type"))
      .agg(count(lit(1)).as("conversions"))
    val w = Window.partitionBy(col("model"))
    both.select(col("model"), col("touch_type"), col("conversions"),
      round(col("conversions") / sum(col("conversions")).over(w), 4)
        .as("share"))
  }
}
