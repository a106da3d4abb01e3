package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

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
    * DuckDB's `epoch_us` on the same file. The cast targets the
    * `TimestampType` object directly, not the `"timestamp"` DDL string:
    * the string resolves through `spark.sql.timestampType`, so a
    * session configured for TIMESTAMP_NTZ would turn it into an NTZ
    * no-op and `unix_micros` would reject the column again.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
