package graft.streaming

import graft.SparkTestBase
import graft.llmops.{Audio, Multimodal}
import graft.llmops.Multimodal.Asset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming media near-dup contract: ingesting N micro-batches
  * through the fingerprint-table gate must admit exactly the assets
  * the BATCH near-dup path keeps over the union — the X6/X72 story
  * for the media tier. The planted fixtures form Hamming cliques
  * (same-group = exact or ≤2-bit variants, cross-group scattered), so
  * keep-lowest-id-per-clique is the unambiguous expected set at any
  * batch split.
  */
class MediaStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-media-stream")
    d.toFile.deleteOnExit()
    d.resolve("fps").toString
  }

  private def streamAssets(batches: Seq[Seq[Asset]], path: String,
                           ingest: (org.apache.spark.sql.Dataset[Asset],
                             String) => org.apache.spark.sql.streaming
                             .DataStreamWriter[Asset]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Asset]
    val q = ingest(mem.toDS(), path).outputMode("update").start()
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
  }

  test("streamed image ingest over N batches equals batch dedup of the union") {
    val path = tmp()
    // 90 planted hash images: 25 groups -> exact-dup + near-dup
    // cliques spread across three arrival batches
    val ids = (0L until 90L)
    val docs = ids.toDF("doc_id")
    val assets = Multimodal.plantedHashImages(spark, docs).collect()
      .sortBy(_.asset_id)
    val batches = Seq(
      assets.filter(_.asset_id < 30).toSeq,
      assets.filter(a => a.asset_id >= 30 && a.asset_id < 60).toSeq,
      assets.filter(_.asset_id >= 60).toSeq)
    streamAssets(batches, path,
      (ds, p) => MediaStreams.imageIngest(ds, p)())

    val admitted = MediaStreams.fingerprintTable(spark, path)
      .select($"id").as[Long].collect().toSet

    // batch expectation: hash the union once, connected components
    // over the banded pairs, keep the min id per component (the
    // fixtures are cliques, so transitive closure = the clique)
    val all = spark.createDataset(assets.toSeq)
    val fps = Multimodal.imageDHashes(spark, all)
      .filter($"dhash".isNotNull)
      .select($"asset_id".as("id"), $"dhash".as("fp"))
    val pairs = graft.llmops.Dedup.bandedHammingPairs(fps, maxHamming = 3)
      .select($"id_a", $"id_b")
    val expected = graft.ops.ConnectedComponents
      .dedupByComponent(fps, pairs, "id")
      .select($"id").as[Long].collect().toSet
    assert(admitted == expected,
      s"streamed-only=${admitted -- expected} batch-only=${expected -- admitted}")
    assert(admitted.nonEmpty && admitted.size < 90)
  }

  test("a later batch's near-dup of an admitted asset cannot slip through") {
    val path = tmp()
    // batch 1: groups 0..9 (doc_ids 0..9); batch 2: the SAME groups
    // under new ids (doc_id % 25 decides the group) -> every batch-2
    // asset must be rejected against the table, nothing admitted
    val b1 = Multimodal.plantedHashImages(spark,
      (0L until 10L).toDF("doc_id")).collect().toSeq
    val b2 = Multimodal.plantedHashImages(spark,
      (25L until 35L).toDF("doc_id")).collect()
      .map(a => a.copy(asset_id = a.asset_id + 1000)).toSeq
    streamAssets(Seq(b1, b2), path,
      (ds, p) => MediaStreams.imageIngest(ds, p)())
    val admitted = MediaStreams.fingerprintTable(spark, path)
      .select($"id").as[Long].collect().toSet
    assert(admitted == (0L until 10L).toSet,
      s"batch-2 re-arrivals must all be gated, admitted=$admitted")
  }

  test("undecodable payloads pass the gate but never enter the table") {
    val path = tmp()
    val good = Multimodal.plantedHashImages(spark,
      Seq(1L).toDF("doc_id")).collect().toSeq
    val corrupt = Seq(Asset(99L, "image", Array[Byte](1, 2, 3),
      None, None, None, Some("png")))
    streamAssets(Seq(good ++ corrupt), path,
      (ds, p) => MediaStreams.imageIngest(ds, p)())
    val table = MediaStreams.fingerprintTable(spark, path)
      .select($"id").as[Long].collect().toSet
    assert(table == Set(1L), s"table=$table")
  }

  test("streamed pdf ingest: extract, gate, exact-dedup, land clean text") {
    val path = tmp()
    val good = "the quick brown fox jumps over a lazy dog and keeps " +
      "running through the field for quite a while longer today"
    val P = graft.llmops.Pdf.PdfCodec
    def pdf(id: Long, text: String) =
      Asset(id, "document", P.encodePdf(Seq(text)), None, None, None,
        Some("pdf"))
    val b1 = Seq(
      pdf(1L, good),
      pdf(2L, "x"), // fails the quality gate
      Asset(3L, "document", Array[Byte](1, 2, 3), None, None, None,
        Some("pdf"))) // corrupt -> no text -> dropped
    val b2 = Seq(
      pdf(4L, good), // exact re-arrival of 1's text -> gated
      pdf(5L, good + " but genuinely new material this time"),
      pdf(6L, good + " but genuinely new material this time")) // in-batch dup
    streamAssets(Seq(b1, b2), path,
      (ds, p) => MediaStreams.pdfTextIngest(ds, p, minQuality = 0.5)())
    val landed = spark.read.parquet(path)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(landed.keySet == Set(1L, 5L) || landed.keySet == Set(1L, 6L),
      s"landed=${landed.keySet}")
    assert(landed(1L) == good, "extracted text must land verbatim")
    // idempotence: replaying an already-landed batch admits nothing
    val again = MediaStreams.admitDocumentBatch(spark,
      spark.createDataset(b1 ++ b2), path, minQuality = 0.5)
    assert(again.count() == 0L)
  }

  test("streamed audio ingest gates energy-hash near-dups across batches") {
    val path = tmp()
    val b1 = Audio.plantedFingerprintAudio(spark,
      (0L until 20L).toDF("doc_id")).collect().toSeq
    val b2 = Audio.plantedFingerprintAudio(spark,
      (20L until 40L).toDF("doc_id")).collect().toSeq
    streamAssets(Seq(b1, b2), path,
      (ds, p) => MediaStreams.audioIngest(ds, p)())
    val admitted = MediaStreams.fingerprintTable(spark, path)
      .select($"id").as[Long].collect().toSet

    val all = spark.createDataset(b1 ++ b2)
    val fps = Audio.audioEnergyHashes(spark, all)
      .filter($"ahash".isNotNull)
      .select($"asset_id".as("id"), $"ahash".as("fp"))
    val pairs = graft.llmops.Dedup.bandedHammingPairs(fps, maxHamming = 3)
      .select($"id_a", $"id_b")
    val expected = graft.ops.ConnectedComponents
      .dedupByComponent(fps, pairs, "id")
      .select($"id").as[Long].collect().toSet
    assert(admitted == expected)
    assert(admitted.nonEmpty && admitted.size < 40)
  }

  test("warc landing-dir ingest: shards dropped over time become clean " +
      "corpus text, re-shipped uris gated") {
    val W = graft.io.Warc
    val P = graft.llmops.Pdf.PdfCodec
    val landing = java.nio.file.Files.createTempDirectory("graft-warc-land")
    landing.toFile.deleteOnExit()
    val table = tmp()
    val good = "the quick brown fox jumps over a lazy dog and keeps " +
      "running through the field for quite a while longer today"
    def shard(name: String, docs: Seq[(String, String)], gz: Boolean): Unit = {
      val recs = W.encodeWarcinfo(name, "2026-01-01T00:00:00Z") +:
        docs.map { case (uri, text) =>
          W.encodeResponse(uri, "2026-01-01T00:00:00Z",
            P.encodePdf(Seq(text)), httpContentType = "application/pdf")
        }
      java.nio.file.Files.write(landing.resolve(name),
        W.encodeFile(recs, gz))
    }

    val q = MediaStreams.warcPdfIngest(spark, landing.toString, table,
        minQuality = 0.5)()
      .outputMode("update").start()
    // shard 1 lands: one good doc, one quality reject
    shard("s1.warc", Seq(
      ("https://ex.com/a.pdf", good),
      ("https://ex.com/tiny.pdf", "x")), gz = false)
    q.processAllAvailable()
    // shard 2 lands later, gzip layout: same text re-shipped under a
    // new uri (content-gated), plus genuinely new material
    shard("s2.warc.gz", Seq(
      ("https://ex.com/a-copy.pdf", good),
      ("https://ex.com/b.pdf", good + " with genuinely new material")),
      gz = true)
    q.processAllAvailable()
    q.stop()

    val landed = spark.read.parquet(table)
      .select($"text").as[String].collect().toSet
    assert(landed == Set(good, good + " with genuinely new material"),
      s"landed=$landed")
  }
}
