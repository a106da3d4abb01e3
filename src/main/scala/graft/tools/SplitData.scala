package graft.tools

import org.apache.spark.sql.SparkSession

/** One-time, untimed test-data re-layout: copy each single-file
  * single-row-group table under `src` to `dst/<name>.parquet` as a
  * multi-file directory (`nFiles` round-robin splits), so scan stages
  * can parallelize the way any production layout would. Same rows,
  * different file layout — this exists to make the 8-vs-32-core
  * scaling probe meaningful (a 1-row-group scan is single-threaded no
  * matter the operator), NOT to speed the bench: the bench keeps
  * reading the driver's own layout.
  *
  *   sbt "runMain graft.tools.SplitData /root/testdata/sf0.1 tmpdata/split0.1 32"
  */
object SplitData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    for (t <- tables) {
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists) {
        spark.read.parquet(p).repartition(nFiles)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
        println(s"split $t -> $dst/$t.parquet ($nFiles files)")
      }
    }
    spark.stop()
  }
}
