package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gaps-and-islands over an event log (SURVEY
  * §2.10 X118): a session is a maximal run of one user's events where
  * consecutive events are ≤ `gapMillis` apart; a strictly larger gap
  * opens a new session (the same boundary rule as the streaming
  * [[graft.streaming.EventStreams.sessionize]], whose
  * `flatMapGroupsWithState` kernel this is the declarative batch twin
  * of — SessionizeSpec pins the two equal on the same input).
  *
  * Scale shape: slim (user, ts, value) rows; both windows partition by
  * user — bounded by one user's event count, never global — and the
  * session roll-up is one groupBy. Catalyst sees plain windows +
  * aggregation, so partial aggregation, AQE, and codegen all apply;
  * there is no per-group state object or encoder serde on this path.
  */
object Sessionize {

  /** Sessions of an `events`-shaped frame: one row per (user,
    * session) — (user_id, session_idx, start_ms, end_ms, n_events,
    * total_value), session_idx 1-based in time order. Event-order
    * ties on ts break by `idCol` (the streaming kernel's rule).
    */
  def sessions(events: DataFrame, gapMillis: Long,
               userCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id",
               valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__ms"), col(idCol))
    events
      .select(col(userCol), col(idCol),
        (graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L)
          .cast("long").as("__ms"), col(valueCol))
      .withColumn("__new",
        when(lag(col("__ms"), 1).over(w).isNull ||
          col("__ms") - lag(col("__ms"), 1).over(w) > gapMillis, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col("__ms")).as("start_ms"),
        max(col("__ms")).as("end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }
}
