package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the IMI vs flat quantizer pipelines under
  * q85/q86's config: training, assignment + list-occupancy histogram,
  * and the capped pair-verify stage, warm (2 in-JVM rounds). This is
  * the probe that exposed (a) the doubled training scans fixed by the
  * joint-Lloyd `imiCentroids` and (b) the interpreted HOF cosine on
  * the verify hot path replaced by the native `CosineSim` kernel
  * (12.3 s → 0.5 s for the IMI pair stage at sf0.1).
  *
  * At sf1 it also substantiates the corpus-scale claim: pass k so
  * that k² ≈ the flat nlist (e.g. k=40 vs nlist=1600 at n=50 k) and
  * the IMI side trains/assigns against 2·k half-centroids where the
  * flat side pays n·nlist full-vector distances.
  *
  *   runMain graft.tools.ImiProbe [sfDir] [k] [flatNlist]
  */
object ImiProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 8
    val flatNlist = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val I = graft.llmops.Ivf
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      val (c1, c2) = I.imiCentroids(emb, k = k, iters = 2)
      println(f"r$round imiCentroids: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val lists = emb.select(col("vec_id"),
        explode(I.imiLists(col("embedding"), c1, c2, 2)).as("list_id"))
      val hist = lists.groupBy("list_id").count()
        .agg(max("count"), avg("count"), count(lit(1))).collect()(0)
      println(f"r$round assign+hist: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"maxList=${hist.get(0)} avgList=${hist.get(1)} nLists=${hist.get(2)}")
      t0 = System.nanoTime()
      val n = graft.llmops.Dedup
        .semanticPairsImiWithCentroids(emb, 0.4, c1, c2, p = 2).count()
      println(f"r$round pairs: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
      t0 = System.nanoTime()
      val cf = I.kmeansCentroids(emb, flatNlist, 2)
      println(f"r$round flat kmeans($flatNlist): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val nf = graft.llmops.Dedup
        .semanticPairsWithCentroids(emb, 0.4, cf, nprobe = 2).count()
      println(f"r$round flat pairs: ${(System.nanoTime() - t0) / 1e9}%.2f s, $nf pairs")
    }
    spark.stop()
  }
}
