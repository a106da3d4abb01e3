package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BinningSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("quantile bins partition the corpus into ordered, balanced buckets") {
    val binned = Binning.quantileBins(docs, $"n_chars", Seq(0.25, 0.5, 0.75))
    assert(binned.count() == docs.count()) // every row in exactly one bin
    val stats = binned.groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .orderBy($"bin")
      .as[(Int, Long, Long, Long)].collect()
    assert(stats.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // bins are ordered: max of bin k ≤ min of bin k+1
    stats.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
    // quartiles: each bin within sampling slack of a quarter
    val n = docs.count().toDouble
    stats.foreach { s => assert(math.abs(s._2 / n - 0.25) < 0.1, s.toString) }
  }

  test("probs validation rejects unsorted or out-of-range fractions") {
    intercept[IllegalArgumentException] {
      Binning.quantileBins(docs, $"n_chars", Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      Binning.quantileBins(docs, $"n_chars", Seq(0.0, 0.5))
    }
  }

  test("per-group thresholds differ by group and bucket per-group terciles") {
    // two groups with disjoint value ranges: global terciles would mix
    // them; per-group terciles must split each group ~evenly
    val df = ((1 to 90).map(i => ("lo", i.toDouble)) ++
      (1 to 90).map(i => ("hi", 1000.0 + i))).toDF("g", "v")
    val thr = Binning.groupQuantileThresholds(df, $"g", $"v",
      Seq(1.0 / 3, 2.0 / 3))
    val tm = thr.collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(tm("lo")._1 < 100 && tm("hi")._1 > 1000)
    val binned = Binning.groupBins(df, thr, $"g", $"v", "bucket")
    val counts = binned.groupBy($"g", $"bucket").count()
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .toMap
    for (g <- Seq("lo", "hi"); b <- 0 to 2)
      assert(math.abs(counts((g, b)) - 30L) <= 1,
        s"group $g bucket $b: ${counts((g, b))}")
    // buckets respect the dumped thresholds exactly
    val viol = binned.filter(
      ($"bucket" === 0 && $"v" > tm("lo")._1 && $"g" === "lo") ||
      ($"bucket" === 2 && $"v" <= tm("lo")._2 && $"g" === "lo")).count()
    assert(viol == 0)
  }

  test("groupBins leaves rows of unseen groups in the overflow bucket") {
    val df = Seq(("a", 1.0), ("zz", 5.0)).toDF("g", "v")
    val thr = Binning.groupQuantileThresholds(
      df.filter($"g" === "a"), $"g", $"v", Seq(0.5))
    val out = Binning.groupBins(df, thr, $"g", $"v")
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    assert(out("a") == 0)
    // unseen group: thresholds null, all comparisons false → last bucket
    assert(out("zz") == 1)
  }

  test("rankNormalize equals the engine-native percent_rank window; " +
      "ties share ranks; single-row groups get 0") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.percent_rank
    // closed form: group a = [1, 2, 2, 5] → pr = 0, 1/3, 1/3, 1;
    // group b single row → 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
      ("b", 9.0)).toDF("g", "v")
    val got = Binning.rankNormalize(df, "v", "g").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", 1.0)) == 0.0)
    assert(math.abs(got(("a", 2.0)) - 1.0 / 3) < 1e-12)
    assert(got(("a", 5.0)) == 1.0)
    assert(got(("b", 9.0)) == 0.0)

    // differential vs percent_rank().over on the real corpus (the
    // single-task-per-group shape this operator exists to avoid —
    // fine at test scale, the semantics referee)
    val T = TextFuncs
    val scored = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", T.qualityScore($"text").as("q"))
    val a = Binning.rankNormalize(scored, "q", "source")
      .select($"doc_id", $"rank_norm").as[(Long, Double)]
      .collect().toMap
    val b = scored.withColumn("rank_norm",
        percent_rank().over(
          Window.partitionBy($"source").orderBy($"q")))
      .select($"doc_id", $"rank_norm").as[(Long, Double)]
      .collect().toMap
    a.foreach { case (id, v) =>
      assert(math.abs(v - b(id)) < 1e-12, s"doc $id") }
    val again = Binning.rankNormalize(scored.repartition(7), "q",
        "source")
      .select($"doc_id", $"rank_norm").as[(Long, Double)]
      .collect().toMap
    assert(again == a)
  }

  test("winsorize: values clamp to the group band, thresholds exposed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group a: 1..100 -> p10 = 10.9, p90 = 90.1 (interpolated)
    val df = (1 to 100).map(v => ("a", v.toDouble))
      .toDF("source", "v")
    val got = Binning.winsorize(df, "v", "source", lo = 0.10, hi = 0.90)
    val row1 = got.filter($"v" === 1.0).head()
    val row50 = got.filter($"v" === 50.0).head()
    val row100 = got.filter($"v" === 100.0).head()
    val lo = row1.getAs[Double]("winsorized_lo")
    val hi = row1.getAs[Double]("winsorized_hi")
    assert(math.abs(lo - 10.9) < 1e-9 && math.abs(hi - 90.1) < 1e-9,
      s"band=($lo, $hi)")
    assert(row1.getAs[Double]("winsorized") == 10.9)
    assert(row50.getAs[Double]("winsorized") == 50.0)
    assert(row100.getAs[Double]("winsorized") == 90.1)
    // row count preserved: winsorize clamps, never drops
    assert(got.count() == 100)
  }

  test("psiReport: identical distributions give psi ~ 0; a shifted " +
      "current snapshot gives a large psi; bins and shares exact") {
    import spark.implicits._
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val same = Binning.psiReport(ref, ref, "v", bins = 10)
      .collect().sortBy(_.getAs[Int]("bin"))
    assert(same.length == 10)
    // every bin holds ~10% on both sides, psi exactly 0
    same.foreach { r =>
      assert(r.getAs[Double]("psi") == 0.0)
      assert(math.abs(r.getAs[Double]("p_ref") - 0.1) < 0.011)
      assert(r.getAs[Double]("p_ref") == r.getAs[Double]("p_cur"))
    }
    // shifted: current entirely above the reference's max -> all mass
    // in the last bin
    val cur = (2001 to 3000).map(_.toDouble).toDF("v")
    val drift = Binning.psiReport(ref, cur, "v", bins = 10)
      .collect().sortBy(_.getAs[Int]("bin"))
    assert(drift.last.getAs[Double]("p_cur") == 1.0)
    assert(drift.head.getAs[Double]("p_cur") == 0.0)
    assert(drift.head.getAs[Double]("psi") > 0.25,
      s"total shift must trip the 0.25 action threshold: ${drift.head}")
    // edges ride along: bin 0 has no lo, last has no hi
    assert(drift.head.isNullAt(drift.head.fieldIndex("lo")))
    assert(drift.last.isNullAt(drift.last.fieldIndex("hi")))
  }

  test("psiReport: an empty or all-null reference fails with the " +
      "cause, not an opaque NPE") {
    import spark.implicits._
    val cur = (1 to 10).map(_.toDouble).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    Seq(empty, nulls).foreach { ref =>
      val e = intercept[IllegalArgumentException] {
        Binning.psiReport(ref, cur, "v", bins = 4)
      }
      assert(e.getMessage.contains("no non-null values"), e.getMessage)
    }
  }

  test("winsorize: groups get independent bands") {
    import spark.implicits._
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      (101 to 110).map(v => ("b", v.toDouble))).toDF("source", "v")
    val got = Binning.winsorize(df, "v", "source", lo = 0.0, hi = 1.0)
      .select($"source", $"winsorized_lo", $"winsorized_hi").distinct()
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("a") == ((1.0, 10.0)) && got("b") == ((101.0, 110.0)))
  }
}
