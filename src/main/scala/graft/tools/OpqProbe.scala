package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ vs plain PQ at scale: training cost (PCA moment pass +
  * Procrustes alternations vs Lloyd alone) and query quality
  * (recall@5 + q89-style effectiveness ratio vs the exact
  * inner-product baseline) at equal m·k budget. Backs the SCALING.md
  * round-6 OPQ note; OpqSpec pins the structured-data win at spec
  * scale, this measures the isotropic-corpus regime.
  *
  *   runMain graft.tools.OpqProbe [sfDir] [nQueries]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/tmpdata/sf1"
    val nq = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val I = graft.llmops.Ivf
    val O = graft.llmops.Opq
    val V = graft.llmops.VectorFuncs
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val exactScored = emb.join(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", V.dotp(col("embedding"), col("query_vec")))
    val exactTop = exactScored
      .groupBy(col("query_id"))
      .agg(graft.llmops.TopK.topK(col("vec_id"), col("sim"), 5).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t._1").as("vec_id"), col("t._2").as("sim"))
    val exactSet = exactTop.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val trueDots = exactScored.select(col("query_id"), col("vec_id"),
      col("sim")).cache()
    trueDots.count()
    val sExact = exactTop.groupBy(col("query_id")).agg(sum(col("sim")).as("se"))

    def report(name: String, mk: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk()
      val got = df.select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect()
      val t = (System.nanoTime() - t0) / 1e9
      val recall = exactSet.count(got.toSet.contains).toDouble / exactSet.size
      val ratios = df.select(col("query_id"), col("vec_id"))
        .join(trueDots, Seq("query_id", "vec_id"))
        .groupBy(col("query_id")).agg(sum(col("sim")).as("sa"))
        .join(sExact, Seq("query_id"))
        .select((col("sa") / col("se")).as("r")).as[Double].collect()
      println(f"$name%-28s ${t}%6.1f s  recall@5=$recall%.2f  " +
        f"ratio min=${ratios.min}%.3f mean=${ratios.sum / ratios.length}%.3f")
    }

    println(s"corpus n=$n, $nq queries, exact baseline = brute-force dot")
    var t0 = System.nanoTime()
    val books = I.pqCodebooks(emb, m = 16, k = 64, iters = 2)
    println(f"train pq m16k64 (Lloyd-2):   ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    t0 = System.nanoTime()
    val (rot, booksO) = O.trainOpq(emb, m = 16, k = 64,
      pqIters = 2, opqIters = 2)
    println(f"train opq m16k64 (pca+2 alt):${(System.nanoTime() - t0) / 1e9}%6.1f s")
    t0 = System.nanoTime()
    val mseP = O.reconstructionMse(emb, O.identityRotation(rot.length), books)
    val mseO = O.reconstructionMse(emb, rot, booksO)
    println(f"reconstruction mse: pq=$mseP%.4f opq=$mseO%.4f " +
      f"(${(System.nanoTime() - t0) / 1e9}%4.1f s)")

    report("pq exhaustive m16k64", () =>
      I.pqTopKWithBooks(emb, q, 5, books))
    report("opq exhaustive m16k64", () =>
      O.opqTopKWithModels(emb, q, 5, rot, booksO))
    report("exact brute dot (sanity=1)", () => exactTop)
    spark.stop()
  }
}
