package graft.tools
import org.apache.spark.sql.SparkSession

/** Repeated-invocation probe: run one named query N times in a single
  * long-lived session, printing per-run wall time and the persistent
  * RDD block count — diagnoses state leaked across invocations
  * (pinned sketch tables, localCheckpoint rounds) that a one-shot
  * driver run never sees.
  *
  *   runMain graft.tools.RepeatProbe <name> <sfDir> [runs]
  */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val persisted = spark.sparkContext.getPersistentRDDs.size
      val mem = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows, " +
        f"$persisted persistent RDDs, heap ${mem / (1 << 20)} MiB")
    }
    spark.stop()
  }
}
