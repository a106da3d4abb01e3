package graft.services

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.io.LineFormats
import graft.model.DocumentLink
import graft.pipeline.Extract
import org.apache.spark.sql.functions._

/** The service-side RuleBasedExtractor (U6) and the relational
  * Extract dataflow must implement identical semantics — verified on
  * the reference's committed 3M fixture.
  */
class ExtractorConsistencySpec extends SparkTestBase {
  import spark.implicits._

  test("RuleBasedExtractor matches relational Extract on the 3M fixture") {
    assume(Files.isDirectory(Paths.get("/root/reference")))
    val links = LineFormats.readLinks(
      spark, "/root/reference/ir_links/financial_links_3M.txt")

    val relational = Extract.latestQuarterReports(links, maxYear = 2025)
      .select($"url", $"year", $"quarter")
      .as[(String, Int, Int)].collect().toSet

    val docLinks = links.collect().map { r =>
      DocumentLink(
        href = r.getAs[String]("url"), text = r.getAs[String]("text"),
        title = r.getAs[String]("title"), link_type = r.getAs[String]("link_type"),
        full_html = r.getAs[String]("full_html"),
        source_url = r.getAs[String]("source_url"),
        file_extension = r.getAs[String]("file_extension"),
        document_type = r.getAs[String]("document_type"))
    }.toSeq
    val service = new RuleBasedExtractor(maxYear = 2025)
      .extract(docLinks).map(r => (r.url, r.year, r.quarter)).toSet

    assert(service == relational,
      s"only-service=${service -- relational} only-relational=${relational -- service}")
  }

  test("rate limiter enforces the minimum gap") {
    val rl = new RateLimiter(120)
    val t0 = System.currentTimeMillis()
    rl.acquire(); rl.acquire(); rl.acquire()
    assert(System.currentTimeMillis() - t0 >= 240)
  }
}
