package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Queries with sketch-based oracles dump their deterministic
    // intermediates (signatures, fingerprints, bucket assignments) to
    // spark-warehouse so the DuckDB oracle can re-derive the relational
    // part independently. Verify-only: Bench leaves the flag unset and
    // skips the writes.
    System.setProperty("graft.materialize", "1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench/Graft.session: bounded object-agg buffers hash
      // safely past Spark's 128-group sort-fallback default
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
      // match Bench/Graft.session: keep compute-dense slim shuffles
      // parallel under AQE coalescing (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "64k")
      .config("spark.ui.enabled", "false")
      // match Graft.session(): verify the plans users actually get
      // (RewriteWindowTopK + SQL function registry active)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_QUERIES: same comma-separated name-prefix subset as
    // Bench, for fast local iteration on one query. The driver never
    // sets it → full dump.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
