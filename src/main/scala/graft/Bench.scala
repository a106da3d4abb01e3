package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // bounded-buffer object aggs (CollectTopK, HLL) hash safely far
      // beyond Spark's 128-group sort-fallback default — see Graft.session
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
      // AQE's parallelism-first coalescing targets
      // max(shuffleBytes/parallelism, minPartitionSize); the 1m default
      // floor serializes compute-dense slim shuffles (string-kernel
      // verifies, exploded-gram windows: KBs of bytes, seconds of CPU)
      // onto a handful of cores. 64k keeps every core busy whenever a
      // shuffle holds ≥ 64k·cores bytes and is a no-op at production
      // shuffle sizes, where bytes/parallelism is far above 1m anyway.
      // Measured 2x on the exact-join tiers (OPTIMIZATION_r14.md);
      // override via spark.sql.adaptive.coalescePartitions.minPartitionSize.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "64k")
      .config("spark.ui.enabled", "false")
      // match Graft.session(): the bench must measure the plans the
      // library gives its users — RewriteWindowTopK + SQL registry on
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_QUERIES: comma-separated name prefixes to bench a
    // subset — the committed sf1 mode (BASELINE.md) runs the
    // iterative/ANN queries against tmpdata/sf1, which carries only
    // the documents/embeddings tables. Unset = the full set.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        subset.forall(_.exists(name.startsWith)) }
    // warmup pass: JIT + codegen + parquet footer caches, untimed.
    // Failures are remembered so the timed loop can surface them in the
    // artifact instead of silently recording time-to-exception.
    val errs = scala.collection.mutable.Map.empty[String, String]
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable => errs(name) = e.getClass.getSimpleName }
    }
    // Per-query min across `passes` FULL passes over the query set (not
    // back-to-back reps of one query): the box is shared, and observed
    // interference arrives as multi-minute load spikes that poison every
    // sample taken inside the spike window. Separated passes put
    // minutes between a query's samples, so a spike must span the whole
    // bench to poison all of them.
    val times = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    (1 to passes).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => errs(name) = e.getClass.getSimpleName }
        val t = (System.nanoTime() - t0) / 1e9
        if (t < times(name)) times(name) = t
      }
    }
    // Artifact contract: the driver tail-captures a noisy sbt log, and
    // rounds 3-4 lost the JSON line to truncation. Defense in depth:
    // (a) the full JSON is written to bench_out.json so the artifact
    // is recoverable from the working tree regardless of log capture;
    // (b) the printed line is compact (sorted keys, 4-decimal values,
    // ~2 KB for 83 queries) with `total` first AND repeated last, so a
    // clip from either end still leaves the headline metric parseable.
    def num(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = times.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = if (times.nonEmpty) times.values.sum else 0.0
    // Lifecycle tagging (SparkEntry.lifecycleQueries): these queries
    // rebuild a persisted artifact or retrain a model per pass, so the
    // 2x-contract math reads total_ex_lifecycle, not total.
    val lifecycle = times.keys.toSeq
      .filter(SparkEntry.lifecycleQueries).sorted
    val lifeJson = lifecycle.map("\"" + _ + "\"").mkString("[", ",", "]")
    val totalEx = times.filterNot(t => SparkEntry.lifecycleQueries(t._1))
      .values.foldLeft(0.0)(_ + _)
    // A query that threw anywhere (warmup or timed) is listed here: its
    // timing above is time-to-exception, not a benchmark. Empty = clean run.
    val errJson = errs.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
      s""""sf":"$sfDir","queries":$qs,""" +
      s""""lifecycle":$lifeJson,"total_ex_lifecycle":${num(totalEx)},""" +
      s""""errors":$errJson,""" +
      s""""total":${num(total)}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(s"bench JSON also written to $outFile")
    println(json)
  }
}
