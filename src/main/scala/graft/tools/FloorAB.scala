package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the AQE small-partition coalescing floor over a query list:
  * one session, the floor flipped at runtime (AQE reads it per
  * execution), full passes interleaved so box drift hits every arm
  * equally. Prints min seconds per (floor, query).
  *
  *   sbt "runMain graft.tools.FloorAB 64k,1m q95_dup_spans,q26_embedding_pairs"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PASSES (default 3).
  */
object FloorAB {
  def main(args: Array[String]): Unit = {
    val floors = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      // The 100-entry default codegen class cache thrashes under the
      // iterative lifecycle operators (k-means/PQ training + encode +
      // serve produce hundreds of distinct generated classes per
      // query): every task then RE-compiles its projections behind
      // the compile KeyLock, serializing short stages — thread dumps
      // showed 23/32 task threads blocked on that lock. Sized to hold
      // a full lifecycle run; entries are soft-referenced, so this is
      // a cap, not a reservation.
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val fns = names.map(n => n -> graft.SparkEntry.queries(n))
    // warmup (JIT/codegen/footers), untimed, at the first floor
    spark.conf.set(key, floors.head)
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
      .withDefaultValue(Double.MaxValue)
    for (_ <- 1 to passes; f <- floors; (n, fn) <- fns) {
      spark.conf.set(key, f)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      if (t < best((f, n))) best((f, n)) = t
    }
    for (n <- names) {
      val row = floors.map(f => f"$f=${best((f, n))}%.2fs").mkString("  ")
      println(f"$n%-28s $row")
    }
    spark.stop()
  }
}
