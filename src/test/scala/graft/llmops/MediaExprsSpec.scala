package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The media decoders' expression face: same kernels as the
  * mapPartitions paths, so the two must agree bit-for-bit; SQL
  * registration must serve them; corrupt payloads must null out, not
  * throw — inside codegen.
  */
class MediaExprsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = (0L until 60L).toDF("doc_id")

  test("pdf_text equals the Dataset extraction path, nulls on corrupt") {
    val assets = Pdf.plantedPdfs(spark, ids).cache()
    val viaExpr = assets.toDF()
      .select($"asset_id", MediaExprs.pdf_text($"content").as("text"))
      .as[(Long, Option[String])].collect().toMap
    val viaDs = Pdf.extractPdfText(spark, assets)
      .map(r => (r.asset_id, r.text)).collect().toMap
    assert(viaExpr == viaDs)
    assert(viaExpr(0L).isEmpty && viaExpr(1L).nonEmpty)
  }

  test("image_dhash / audio_energy_hash equal their mapPartitions paths") {
    val imgs = Multimodal.plantedHashImages(spark, ids).cache()
    val viaExpr = imgs.toDF()
      .select($"asset_id", MediaExprs.image_dhash($"content").as("h"))
      .as[(Long, Option[Long])].collect().toMap
    val viaDs = Multimodal.imageDHashes(spark, imgs)
      .as[(Long, Option[Long])].collect().toMap
    assert(viaExpr == viaDs && viaExpr.values.exists(_.nonEmpty))

    val wavs = Audio.plantedFingerprintAudio(spark, ids).cache()
    val viaExprA = wavs.toDF()
      .select($"asset_id", MediaExprs.audio_energy_hash($"content").as("h"))
      .as[(Long, Option[Long])].collect().toMap
    val viaDsA = Audio.audioEnergyHashes(spark, wavs)
      .as[(Long, Option[Long])].collect().toMap
    assert(viaExprA == viaDsA && viaExprA.values.exists(_.nonEmpty))
  }

  test("SQL registration: the functions compose in plain spark.sql") {
    Pdf.plantedPdfs(spark, ids).toDF().createOrReplaceTempView("pdf_assets")
    val n = spark.sql(
      "SELECT count(*) FROM pdf_assets WHERE pdf_text(content) IS NOT NULL")
      .head().getLong(0)
    assert(n == ids.count() - 2) // doc 0 and 37 are the truncated rows
    // hashes compose with bit ops in SQL — the banded-join building block
    Multimodal.plantedHashImages(spark, ids).toDF()
      .createOrReplaceTempView("img_assets")
    val bands = spark.sql(
      """SELECT count(DISTINCT (image_dhash(content) >> 16) & 65535)
         FROM img_assets WHERE image_dhash(content) IS NOT NULL""")
      .head().getLong(0)
    assert(bands > 0)
  }

  test("corrupt and null payloads null out inside codegen, never throw") {
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "content")
    val out = junk.select(
      MediaExprs.pdf_text($"content").as("t"),
      MediaExprs.image_dhash($"content").as("d"),
      MediaExprs.audio_energy_hash($"content").as("a"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }
}
