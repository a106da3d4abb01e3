package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints formatted physical plans for selected
  * queries so scan pushdown / broadcast / window-limit choices can be
  * audited (`sbt "runMain graft.tools.Explain q01_pricing_summary"`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      // match Bench/Verify/Graft.session: audit the plans users get
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (n <- names; fn <- graft.SparkEntry.queries.get(n)) {
      println(s"===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
