package graft.ops

import org.apache.spark.sql.DataFrame

/** Output file sizing — the small-files problem at the write boundary.
  *
  * A 100 TB job that writes one file per shuffle partition produces
  * either millions of KB-sized files (metadata pressure on the object
  * store and every downstream reader) or a handful of multi-GB files
  * (no read parallelism). This sizes the write to a target per-file
  * byte count using Catalyst's own size estimate, so the file count
  * tracks the DATA volume rather than whatever
  * `spark.sql.shuffle.partitions` happened to be.
  */
object Output {

  /** Repartition so a subsequent write produces files near `targetMB`
    * (pre-compression — parquet typically compresses 2-5×, so size the
    * target accordingly). Uses the optimized plan's size estimate; for
    * an exact-count cap compose with the writer's `maxRecordsPerFile`.
    */
  def sizedForWrite(df: DataFrame, targetMB: Int = 256): DataFrame = {
    require(targetMB > 0)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = BigInt(targetMB) * 1024 * 1024
    val parts = ((bytes + target - 1) / target).max(1).min(1 << 20).toInt
    df.repartition(parts)
  }
}
