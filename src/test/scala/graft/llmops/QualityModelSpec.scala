package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  test("learns a separable toy vocabulary perfectly") {
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "clean prose with useful words here", 1)
      else (i, "spam junk buy now click banner", 0)
    }.toDF("doc_id", "text", "label")
    val (w, b) = QualityModel.train(docs, epochs = 10, lr = 4.0)
    val preds = QualityModel.score(docs, w, b)
      .select($"doc_id", ($"prob" >= 0.5).as("pred"))
      .as[(Long, Boolean)].collect().toMap
    assert((0L until 40L).forall(i => preds(i) == (i % 2 == 0)))
  }

  test("distills the quality heuristic above the majority-class baseline") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("label",
        (TextFuncs.qualityScore($"text") >= 1.0).cast("int"))
      .cache()
    val base = {
      val n = docs.count().toDouble
      val pos = docs.filter($"label" === 1).count().toDouble
      math.max(pos, n - pos) / n
    }
    // 500 docs need more, hotter epochs than the at-scale defaults:
    // the minority class is 7% and the gradient signal per epoch small
    val (w, b) = QualityModel.train(docs, epochs = 25, lr = 16.0)
    val acc = QualityModel.score(docs, w, b)
      .join(docs.select($"doc_id", $"label"), "doc_id")
      .select(avg(
        (($"prob" >= 0.5).cast("int") === $"label").cast("double")))
      .head().getDouble(0)
    assert(acc > base + 0.02,
      s"distillation accuracy $acc should beat majority baseline $base")
    assert(acc >= 0.95, s"distillation accuracy $acc below 0.95")
  }

  test("empty weights score sigmoid(bias) for every doc, even empty text") {
    val docs = Seq((1L, "some words"), (2L, "")).toDF("doc_id", "text")
    val scores = QualityModel.score(docs, Map.empty, 0.0)
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) == 0.5 && scores(2L) == 0.5)
  }

  test("feature keys are distinct 4-hex md5 prefixes; bias key cannot collide") {
    val keys = Seq(Tuple1("the the THE word"))
      .toDF("text")
      .select(QualityModel.featureKeys($"text").as("k"))
      .head().getSeq[String](0)
    assert(keys.length == 2, s"dup tokens must collapse: $keys")
    assert(keys.forall(k => k.length == 4 && k.forall(c =>
      ('0' to '9').contains(c) || ('a' to 'f').contains(c))))
    assert(!QualityModel.BiasKey.forall(c =>
      ('0' to '9').contains(c) || ('a' to 'f').contains(c)))
  }

  test("prCurve: exact counts on a planted grid; threshold rows count " +
      "exactly the rows at-or-above; monotone recall") {
    import org.apache.spark.sql.functions.col
    // 4 bins; probs placed mid-bin: positives at .9 .9 .6, negatives
    // at .6 .1 — P = 3
    val scored = Seq((1L, 0.9, 1), (2L, 0.92, 1), (3L, 0.6, 1),
      (4L, 0.65, 0), (5L, 0.1, 0)).toDF("id", "prob", "label")
    val got = QualityModel.prCurve(scored, nBins = 4)
      .orderBy(col("threshold").desc)
      .select(col("threshold"), col("pred_pos"), col("tp"),
        col("precision"), col("recall"))
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0.75, 2L, 2L, 1.0, 2.0 / 3),          // prob >= .75: the two .9s
      (0.5, 4L, 3L, 0.75, 1.0),              // adds .6/.65
      (0.0, 5L, 3L, 0.6, 1.0)), s"got=$got") // everything
    // prob exactly 1.0 clamps into the top bin
    val top = QualityModel.prCurve(
      Seq((1L, 1.0, 1)).toDF("id", "prob", "label"), nBins = 4)
      .select(col("threshold")).as[Double].collect().toSeq
    assert(top == Seq(0.75))
  }

  test("calibrationReport: a perfectly calibrated score has ECE 0; " +
      "a constant-overconfident one reports the gap") {
    import spark.implicits._
    // bin [0.7, 0.8): 10 rows at prob 0.75 with exactly 7-8 positives
    val calibrated = ((1 to 8).map(i => (0.75, 1)) ++
      Seq((0.75, 0), (0.75, 0))).toDF("prob", "label")
    val c = QualityModel.calibrationReport(calibrated, nBins = 10)
      .head()
    assert(c.getAs[Double]("avg_prob") == 0.75)
    assert(c.getAs[Double]("frac_pos") == 0.8)
    assert(math.abs(c.getAs[Double]("gap") - 0.05) < 1e-9)
    assert(c.getAs[Double]("ece") == c.getAs[Double]("gap"))
    // overconfident: prob 0.9 but only half positive
    val over = (1 to 10).map(i => (0.9, i % 2)).toDF("prob", "label")
    val o = QualityModel.calibrationReport(over, nBins = 10).head()
    assert(o.getAs[Double]("gap") == 0.4)
    assert(o.getAs[Double]("ece") == 0.4)
  }

  test("calibrationReport: ece is the sum of per-bin contributions " +
      "and rides every row") {
    import spark.implicits._
    val scored = Seq((0.1, 0), (0.1, 1), (0.9, 1), (0.9, 1))
      .toDF("prob", "label")
    val rows = QualityModel.calibrationReport(scored, nBins = 10)
      .collect()
    val eces = rows.map(_.getAs[Double]("ece")).distinct
    assert(eces.length == 1)
    val sumContrib = rows.map(_.getAs[Double]("ece_contrib")).sum
    assert(math.abs(sumContrib - eces.head) < 2e-4) // 4dp rounding
    // prob 1.0 would index bin 10: clamped into the top bin
    val edge = Seq((1.0, 1)).toDF("prob", "label")
    assert(QualityModel.calibrationReport(edge, nBins = 10)
      .head().getAs[Double]("bin_lo") == 0.9)
  }
}
