package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros

/** Timestamp-key helpers shared by the time-bucketed operators. */
object TimeFuncs {

  /** Epoch microseconds, robust to the parquet writer's timestamp
    * flavor: `unix_micros` rejects TIMESTAMP_NTZ, and whether a
    * parquet `ts` column surfaces as TIMESTAMP or TIMESTAMP_NTZ
    * depends on the writer's `isAdjustedToUTC` flag — an input
    * property no operator should be coupled to. The cast is a no-op
    * for TIMESTAMP and reads NTZ wall-clock values in the session
    * timezone, which the engine pins to UTC (Graft.session, Bench,
    * Verify), so both flavors yield identical keys — matching
    * DuckDB's `epoch_us` on the same file.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
