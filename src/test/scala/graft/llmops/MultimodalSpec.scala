package graft.llmops

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary assets flow through distributed feature extraction") {
    val docs = Tables.documents(spark, sf0001)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val feats = Multimodal.extractFeatures(spark, assets).cache()
    assert(feats.count() == docs.count())
    val r = feats.filter($"asset_id" === 0).head()
    assert(r.feature.length == 8)
    assert(r.n_bytes > 0)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, assets)
      .filter($"asset_id" === 0).head()
    assert(again.feature.toSeq == r.feature.toSeq)
  }

  test("binary payloads round-trip through parquet (BinaryType IO)") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
      .resolve("assets").toString
    assets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // features over the re-read binary column match the direct path
    val f1 = Multimodal.extractFeatures(spark,
      back.as[Multimodal.Asset]).collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, assets)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
  }

  test("media types partition as declared") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    val byType = Multimodal.syntheticAssets(spark, docs)
      .groupByKey(_.media_type).count().collect().toMap
    assert(byType.keySet == Set("image", "audio", "video"))
  }
}
