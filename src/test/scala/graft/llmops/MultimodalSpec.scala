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

  test("media types partition as declared") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    val byType = Multimodal.syntheticAssets(spark, docs)
      .groupByKey(_.media_type).count().collect().toMap
    assert(byType.keySet == Set("image", "audio", "video"))
  }
}
