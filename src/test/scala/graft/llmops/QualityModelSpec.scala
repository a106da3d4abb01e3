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
}
