package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-cost probe for the two ADC scoring paths: train PQ codebooks
  * ONCE, then time warm `pqTopKWithBooks` passes with `scan = "lut"`
  * (per-query lookup table, m lookups per candidate) against
  * `scan = "dot"` (full codeword-reconstruction dot, dim multiplies
  * per candidate). Training is excluded by construction — this is
  * the train-once / serve-many regime where the scan dominates, and
  * a wide query batch (candidates = |corpus|·|queries|) makes the
  * per-candidate kernel cost the measured quantity.
  *
  *   runMain graft.tools.AdcProbe <sfDir> [nQueries] [runs]
  */
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 64
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_AGG_FALLBACK", "65536"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val books = graft.llmops.Ivf.pqCodebooks(emb, m = 8, k = 16, iters = 2)
    for (scan <- Seq("dot", "lut"); i <- 1 to runs) {
      val t0 = System.nanoTime()
      val rows = graft.llmops.Ivf
        .pqTopKWithBooks(emb, q, k = 5, books, scan = scan)
        .count()
      println(f"adc scan=$scan n=$n q=$nQueries run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    }
    // stage decomposition: score-only (no rerank heap), and the bare
    // join with a constant score (no kernel at all)
    import graft.llmops.Ivf._
    val coded = emb.select(col("vec_id"), pqEncode(col("embedding"), books)
      .as("codes")).cache()
    coded.count()
    val stages: Seq[(String, () => Long)] = Seq(
      "join_only" -> (() => coded.crossJoin(broadcast(q.select(col("query_id"))))
        .filter(col("vec_id") =!= col("query_id")).count()),
      "score_dot" -> (() => coded.crossJoin(broadcast(q))
        .withColumn("sim", pq_adc_dot(col("codes"), col("query_vec"), books))
        .filter(col("sim").isNotNull).count()),
      "score_lut" -> (() => coded.crossJoin(broadcast(
          q.withColumn("__lut", pq_lut(col("query_vec"), books))
            .select(col("query_id"), col("__lut"))))
        .withColumn("sim", pq_lut_dot(col("codes"), col("__lut"), 16))
        .filter(col("sim").isNotNull).count()),
      // same scan plus Spark round(…, 6): detects the
      // BigDecimal.valueOf(double) per-row cost
      "score_lut_round" -> (() => coded.crossJoin(broadcast(
          q.withColumn("__lut", pq_lut(col("query_vec"), books))
            .select(col("query_id"), col("__lut"))))
        .withColumn("sim", round(pq_lut_dot(col("codes"), col("__lut"), 16), 6))
        .filter(col("sim").isNotNull).count()),
      // posexplode forces the heap to actually run — a bare count()
      // over the groupBy lets Catalyst prune the unused topk aggregate
      "rerank_forced" -> (() => coded.crossJoin(broadcast(
          q.withColumn("__lut", pq_lut(col("query_vec"), books))
            .select(col("query_id"), col("__lut"))))
        .withColumn("sim", pq_lut_dot(col("codes"), col("__lut"), 16))
        .filter(col("sim").isNotNull)
        .groupBy(col("query_id"))
        .agg(graft.llmops.TopK.topK(col("vec_id"), col("sim"), 5).as("topk"))
        .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
        .count()),
      "encode_only" -> (() => emb.select(col("vec_id"),
        pqEncode(col("embedding"), books).as("codes")).count()),
      "real_full" -> (() => graft.llmops.Ivf
        .pqTopKWithBooks(emb, q, k = 5, books, scan = "lut").count())
    )
    for ((nm, f) <- stages; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val rows = f()
      println(f"adc stage=$nm n=$n q=$nQueries run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    }
    println("== real plan ==")
    graft.llmops.Ivf.pqTopKWithBooks(emb, q, k = 5, books, scan = "lut")
      .explain("formatted")
    spark.stop()
  }
}
