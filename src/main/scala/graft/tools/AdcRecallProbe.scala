package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADC-family quality/cost probe at scale: raw-vector vs residual
  * PQ codebooks (Jégou §V.A side-by-side) and the IMI coarse axis
  * composed with the ADC scan, all measured against the exact
  * inner-product baseline on the same corpus. Backs the SCALING.md
  * "residual vs raw" and "IMI+ADC" sections; q89 pins the same ratio
  * contract at driver scale.
  *
  *   runMain graft.tools.AdcRecallProbe [sfDir] [nQueries]
  */
object AdcRecallProbe {
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
    val V = graft.llmops.VectorFuncs
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))

    // exact inner-product baseline (self-excluded), once
    val exactScored = emb.join(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", V.dotp(col("embedding"), col("query_vec")))
    // rank AFTER self-exclusion (a unit vector's best dot is itself)
    val exactTop = exactScored
      .groupBy(col("query_id"))
      .agg(graft.llmops.TopK.topK(col("vec_id"), col("sim"), 5).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t._1").as("vec_id"),
        col("t._2").as("sim"))
    val exactSet = exactTop.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val trueDots = exactScored.select(col("query_id"), col("vec_id"),
      col("sim")).cache()
    trueDots.count()
    val sExact = exactTop
      .groupBy(col("query_id")).agg(sum(col("sim")).as("se"))

    def report(name: String, mk: () => DataFrame): Unit = {
      var t0 = System.nanoTime()
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
    // flat coarse quantizer sized by the nlist ∝ n rule (SCALING.md)
    val nlist = math.max(16, (n / 200).toInt)
    val nprobe = math.max(4, nlist / 8)
    println(s"coarse: nlist=$nlist nprobe=$nprobe; imi k=sqrt(nlist), p²≈nprobe")
    var t0 = System.nanoTime()
    val cents = I.kmeansCentroids(emb, nlist, iters = 2)
    println(f"train coarse (Lloyd-2):      ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    t0 = System.nanoTime()
    val books = I.pqCodebooks(emb, m = 16, k = 64, iters = 2)
    println(f"train raw books m16k64:      ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    t0 = System.nanoTime()
    val booksR = I.pqCodebooksResidual(emb, cents, m = 16, k = 64, iters = 2)
    println(f"train resid books m16k64:    ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    val kImi = math.max(2, math.sqrt(nlist.toDouble).round.toInt)
    t0 = System.nanoTime()
    val (c1, c2) = I.imiCentroids(emb, kImi, iters = 2)
    println(f"train imi halves k=$kImi:        ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    val p = math.max(2, math.sqrt(nprobe.toDouble).round.toInt)

    report("ivfadc raw m16k64", () =>
      I.ivfAdcTopKWithModels(emb, q, 5, cents, books, nprobe))
    report("ivfadc resid m16k64", () =>
      I.ivfAdcResidualTopKWithModels(emb, q, 5, cents, booksR, nprobe))
    report(s"imi+adc k=$kImi p=$p m16k64", () =>
      I.imiAdcTopKWithModels(emb, q, 5, c1, c2, books, p))
    report("pq exhaustive m16k64", () =>
      I.pqTopKWithBooks(emb, q, 5, books))
    report("exact brute dot (sanity=1)", () => exactTop)
    spark.stop()
  }
}
