package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job time attribution for one named query: runs the query
  * (warm-up + timed pass) with a listener that prints, for every Spark
  * job, its wall duration, task count, and the first line of its call
  * site — so a composite query's cost (index build, train loop,
  * serve) decomposes without the UI.
  *
  *   sbt "runMain graft.tools.JobProfile q170_hybrid_tuning"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "64k"))
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
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm-up: JIT + codegen caches, untimed and unlisted
    fn(spark, sfDir).count()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (js.time, site, js.stageInfos.map(_.numTasks).sum))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stageTasks.put(si.stageId, ms)
        lines.add(f"  stage ${si.stageId}%4d  ${ms / 1000.0}%8.3f s  " +
          f"${si.numTasks}%5d tasks  ${si.name.take(110)}")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site, nt) =>
          lines.add(f"job ${je.jobId}%4d  ${(je.time - t0) / 1000.0}%8.3f s  $nt%5d tasks  $site")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    // listener bus is async; give it a moment to drain before printing
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    lines.asScala.foreach(println)
    println(f"TOTAL $name: $total%.3f s, $n rows, ${lines.size} jobs")
    spark.stop()
  }
}
