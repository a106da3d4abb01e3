package graft.llmops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Merging t-digest. The properties the q175 contract leans on:
  * bounded state, realized-rank accuracy under partial aggregation /
  * repartitioning / driver-space merges (the order-independent
  * guarantee), exactness when groups are tiny, and tail sharpness —
  * the reason to use k₁-scaled digests over uniform summaries at all.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  // splitmix-ish deterministic doubles in [0, 1)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def u01(i: Long): Double = (math.abs(mix(i)) % 1000000) / 1000000.0

  private def realizedRank(values: Array[Double], est: Double): Double =
    values.count(_ <= est).toDouble / values.length

  test("exact on tiny groups; p0/p1 clamp to the extremes") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val dg = df.agg(Quantiles.tdigestAgg($"v", 100).as("d"))
    val row = dg.select(
      Quantiles.tdigestQuantile($"d", 0.5),
      Quantiles.tdigestQuantile($"d", 0.0),
      Quantiles.tdigestQuantile($"d", 1.0)).head()
    assert(row.getDouble(0) == 3.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 5.0)
  }

  test("rank-error contract holds under repartitioning and the " +
    "centroid count stays bounded") {
    val n = 20000
    val values = Array.tabulate(n)(i => u01(i.toLong))
    val df = values.toSeq.toDF("v").repartition(13)
    val dg = df.agg(Quantiles.tdigestAgg($"v", 100).as("d"))
    val cents = dg.select(size($"d")).as[Int].head()
    assert(cents <= 200, s"state unbounded: $cents centroids at delta=100")
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = dg.select(Quantiles.tdigestQuantile($"d", q)).as[Double].head()
      val err = math.abs(realizedRank(values, est) - q)
      assert(err <= 0.02, s"rank error $err at q=$q (est $est)")
      // k1 scaling: tails are sharper than the global bound
      if (q <= 0.01 || q >= 0.99)
        assert(err <= 0.005, s"tail rank error $err at q=$q")
    }
  }

  test("driver-space merge of per-shard digests keeps the union's " +
    "guarantee (the cross-job fold)") {
    val n = 10000
    val values = Array.tabulate(n)(i => u01(i.toLong) * u01(i + 7) * 100.0)
    val (l, r) = values.splitAt(n / 3)
    def digestOf(vs: Array[Double]): Seq[(Double, Double)] =
      vs.toSeq.toDF("v").agg(Quantiles.tdigestAgg($"v", 100).as("d"))
        .select(explode($"d").as("c"))
        .select($"c.mean", $"c.weight").as[(Double, Double)].collect().toSeq
    val merged = Quantiles.mergeTDigests(digestOf(l), digestOf(r), 100)
    assert(merged.length <= 200)
    assert(math.abs(merged.map(_._2).sum - n) < 1e-6) // mass conserved
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = Quantiles.tdigestQuantileValue(merged, q)
      val err = math.abs(realizedRank(values, est) - q)
      assert(err <= 0.02, s"merged rank error $err at q=$q")
    }
  }

  test("nulls are ignored; an empty group digests to an empty array " +
    "and quantiles to null") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val dg = df.agg(Quantiles.tdigestAgg($"v", 100).as("d"))
    assert(dg.select(size($"d")).as[Int].head() == 2)
    val empty = df.filter($"v" > 100.0)
      .agg(Quantiles.tdigestAgg($"v", 100).as("d"))
    assert(empty.select(size($"d")).as[Int].head() == 0)
    assert(empty.select(Quantiles.tdigestQuantile($"d", 0.5)).head().isNullAt(0))
  }

  test("tdigest / tdigest_quantile are callable from SQL") {
    Seq(1.0, 2.0, 3.0).toDF("v").createOrReplaceTempView("td_in")
    val out = spark.sql(
      "SELECT tdigest_quantile(tdigest(v, 100), 0.5) AS med FROM td_in")
      .as[Double].head()
    assert(out == 2.0)
  }

  test("per-group digests via groupBy agree with per-group exact " +
    "quantiles within the contract") {
    val rows = (0 until 4000).map { i =>
      (s"g${i % 4}", u01(i.toLong) * (1 + i % 4))
    }
    val df = rows.toDF("g", "v").repartition(7)
    val est = df.groupBy($"g")
      .agg(Quantiles.tdigestAgg($"v", 100).as("d"))
      .select($"g", Quantiles.tdigestQuantile($"d", 0.9).as("p90"))
      .as[(String, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val values = vs.map(_._2).toArray
      val err = math.abs(realizedRank(values, est(g)) - 0.9)
      assert(err <= 0.02, s"group $g rank error $err")
    }
  }
}
