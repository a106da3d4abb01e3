package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for IVF-cluster-scoped semantic dedup: time
  * `Dedup.semanticPairs` at a given corpus and `nlist`, warm (2
  * in-JVM runs). Substantiates the SCALING.md claim that scaling
  * `nlist ∝ n` holds list occupancy (≈ nprobe·n/nlist) — and with it
  * per-task verify cost — constant while total verify work stays
  * linear in corpus size; an UNscaled nlist instead saturates the
  * `maxList` cap and recall collapses (fewer pairs on more data).
  *
  *   runMain graft.tools.SemanticProbe <sfDir> <nlist> [threshold]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlist = args(1).toInt
    val threshold = if (args.length > 2) args(2).toDouble else 0.4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = graft.llmops.Dedup
        .semanticPairs(emb, threshold, nlist, nprobe = 2, kmeansIters = 2)
        .count()
      println(f"semanticPairs n=$n nlist=$nlist run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, $pairs pairs")
    }
    spark.stop()
  }
}
