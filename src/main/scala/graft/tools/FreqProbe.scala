package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Misra-Gries summary against the exact
  * groupBy-then-top-k plan on two item streams from the sf0.1
  * lineitem table: the q106 Zipf stream (few thousand distinct,
  * heavy hitters real) and a uniform high-cardinality stream (one
  * distinct item per row — the "distinct ~ corpus" regime where the
  * exact plan's shuffle is the whole corpus and the summary's is
  * partitions·k entries). Backs the SCALING.md numbers.
  */
object FreqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val u = (conv(substring(md5(concat_ws("-", $"l_orderkey",
        $"l_linenumber")), 1, 8), 16, 10).cast("double") + 1.0) /
      4294967296.0
    val zipf = li.select(
      floor(lit(1.0) / u).cast("long").cast("string").as("item"))
    val unif = li.select(
      concat_ws("-", $"l_orderkey", $"l_linenumber").as("item"))

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${runs.min}%.3f s")
    }

    for ((name, items) <- Seq(("zipf", zipf), ("uniform", unif))) {
      val n = items.count()
      val d = items.distinct().count()
      println(s"== $name stream: $n rows, $d distinct")
      time(s"$name exact group+top16") {
        items.groupBy($"item").count()
          .orderBy($"count".desc, $"item").limit(16).collect()
      }
      time(s"$name mg summary k=16") {
        items.agg(graft.llmops.Freq.freqItems($"item", 16)).collect()
      }
    }
    spark.stop()
  }
}
