package graft.pipeline

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** S11: nested per-company metadata JSON sink round-trip. */
class MetadataSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("metadata document survives a JSON write/read round-trip") {
    val companies = Seq(("corp", "MMM", "https://ir.corp.com")).toDF("company", "ticker", "ir_url")
    val stats = Seq(("corp", 3L, 10L)).toDF("company", "urls_visited", "urls_found")
    val downloads = Seq(
      ("corp", "u1", "t1", "c1", 2025, 2, "s1", "pdf", "/p1", 10L, "aa", "application/pdf", true, "", "2026-01-01T00:00:05.000Z"),
      ("corp", "u2", "t2", "c2", 2025, 2, "s2", "pdf", "/p2", 20L, "bb", "application/pdf", true, "", "2026-01-01T00:00:09.000Z"))
      .toDF("company", "url", "title", "category", "year", "quarter",
        "source_url", "file_extension", "file_path", "file_size", "checksum",
        "content_type", "success", "error", "download_timestamp")
    val meta = Orchestrator.metadata(companies, stats, downloads, "rule-based")

    val dir = Files.createTempDirectory("graft-meta").resolve("out").toString
    meta.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 1)
    val r = back.head()
    assert(r.getAs[String]("status") == "completed")
    assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("downloaded_files")).size == 2)
    assert(r.getAs[Long]("urls_found") == 10L)
    // download window aggregated from per-file stamps
    assert(r.getAs[String]("download_start_time") == "2026-01-01T00:00:05.000Z")
    assert(r.getAs[String]("download_end_time") == "2026-01-01T00:00:09.000Z")
    assert(r.getAs[Double]("download_secs") == 4.0)
  }

  test("stage timestamps land in the metadata document with an injected clock") {
    val companies = Seq(("corp", "MMM", "https://ir.corp.com")).toDF("company", "ticker", "ir_url")
    val stats = Seq(("corp", 3L, 10L)).toDF("company", "urls_visited", "urls_found")
    val downloads = Seq(
      ("corp", "u1", "t1", "c1", 2025, 2, "s1", "pdf", "/p1", 10L, "aa", "application/pdf", true, "", "2026-01-01T00:00:06.000Z"))
      .toDF("company", "url", "title", "category", "year", "quarter",
        "source_url", "file_extension", "file_path", "file_size", "checksum",
        "content_type", "success", "error", "download_timestamp")
    val clock = new graft.services.FixedClock(
      java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli, 1000L)
    val stamps = Seq.fill(6)(clock.nowIso())
    assert(stamps.head == "2026-01-01T00:00:00.000Z")   // deterministic clock
    val times = Orchestrator.StageTimes(
      pipelineStart = stamps(0), scrapingStart = stamps(1),
      scrapingEnd = stamps(2), extractionStart = stamps(3),
      extractionEnd = stamps(4), pipelineEnd = stamps(5))
    val r = Orchestrator.metadata(companies, stats, downloads, "rule-based",
      times = Some(times)).head()
    // the reference collector's 8 stage stamps (simple_metadata_collector.py:40-58)
    assert(r.getAs[String]("pipeline_start_time") == "2026-01-01T00:00:00.000Z")
    assert(r.getAs[String]("scraping_start_time") == "2026-01-01T00:00:01.000Z")
    assert(r.getAs[String]("scraping_end_time") == "2026-01-01T00:00:02.000Z")
    assert(r.getAs[String]("extraction_start_time") == "2026-01-01T00:00:03.000Z")
    assert(r.getAs[String]("extraction_end_time") == "2026-01-01T00:00:04.000Z")
    assert(r.getAs[String]("pipeline_end_time") == "2026-01-01T00:00:05.000Z")
    assert(r.getAs[String]("download_start_time") == "2026-01-01T00:00:06.000Z")
    assert(r.getAs[String]("download_end_time") == "2026-01-01T00:00:06.000Z")
    assert(r.getAs[Double]("scraping_secs") == 1.0)
    assert(r.getAs[Double]("extraction_secs") == 1.0)
    assert(r.getAs[Double]("pipeline_secs") == 5.0)
    assert(r.isNullAt(r.fieldIndex("error_message")))
  }

  test("ir indicator scoring (A5): keyword hits + title bonus") {
    val df = Seq(
      ("quarterly results and annual report for shareholders", "Investor Relations"),
      ("our products are great", "Products"))
      .toDF("text", "title")
    val got = df.select(
      graft.expr.LinkFuncs.irIndicatorScore($"text", $"title").as("s"))
      .as[Int].collect().toSeq
    assert(got.head >= 5)   // 2+ keyword hits + 3 title bonus
    assert(got(1) == 0)
  }
}
