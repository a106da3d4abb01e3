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
      ("corp", "u1", "t1", "c1", 2025, 2, "s1", "pdf", "/p1", 10L, "aa", "application/pdf", true, ""),
      ("corp", "u2", "t2", "c2", 2025, 2, "s2", "pdf", "/p2", 20L, "bb", "application/pdf", true, ""))
      .toDF("company", "url", "title", "category", "year", "quarter",
        "source_url", "file_extension", "file_path", "file_size", "checksum",
        "content_type", "success", "error")
    val meta = Orchestrator.metadata(companies, stats, downloads, "rule-based")

    val dir = Files.createTempDirectory("graft-meta").resolve("out").toString
    meta.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 1)
    val r = back.head()
    assert(r.getAs[String]("status") == "completed")
    assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("downloaded_files")).size == 2)
    assert(r.getAs[Long]("urls_found") == 10L)
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
