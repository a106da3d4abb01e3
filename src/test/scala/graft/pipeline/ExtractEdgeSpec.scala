package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** W4/A2 edge semantics of the latest-quarter extraction. */
class ExtractEdgeSpec extends SparkTestBase {
  import spark.implicits._

  private def links(rows: (String, String)*) =
    rows.toDF("url", "text")
      .withColumn("title", lit(""))
      .withColumn("link_type", lit("document"))
      .withColumn("full_html", lit(""))
      .withColumn("source_url", lit(""))
      .withColumn("file_extension",
        lower(substring_index($"url", ".", -1)))
      .withColumn("document_type", lit("PDF Document"))

  test("no dated links: everything passes, labeled (maxYear, 4)") {
    val out = Extract.latestQuarterReports(
      links(("https://x/a.pdf", "no dates"), ("https://x/b.pdf", "none")),
      maxYear = 2026)
    assert(out.count() == 2)
    assert(out.select($"year", $"quarter").distinct()
      .as[(Int, Int)].collect().toSet == Set((2026, 4)))
  }

  test("quarter-less max year defaults latest quarter to 4") {
    val out = Extract.latestQuarterReports(
      links(
        ("https://x/a.pdf", "Annual 2025"),          // (2025, null)
        ("https://x/b.pdf", "Q3 2024 earnings")),    // older year
      maxYear = 2026)
    // latest = (2025, 4): the null-quarter 2025 doc passes, Q3-2024 drops
    assert(out.select($"url").as[String].collect().toSeq == Seq("https://x/a.pdf"))
    assert(out.select($"year", $"quarter").as[(Int, Int)].head() == ((2025, 4)))
  }

  test("old-PDF guard drops known-old PDFs but keeps undated ones") {
    val out = Extract.latestQuarterReports(
      links(
        ("https://x/old.pdf", "Q1 2019 report"),
        ("https://x/new.pdf", "Q2 2025 report"),
        ("https://x/undated.pdf", "whitepaper")),
      maxYear = 2026, minYear = 2023)
    assert(out.select($"url").as[String].collect().toSet ==
      Set("https://x/new.pdf", "https://x/undated.pdf"))
  }

  test("per-company latest is computed independently") {
    val df = Seq(
      ("a", "https://x/a1.pdf", "Q2 2025"),
      ("a", "https://x/a2.pdf", "Q1 2025"),
      ("b", "https://x/b1.pdf", "Q4 2023"))
      .toDF("company", "url", "text")
      .withColumn("title", lit("")).withColumn("link_type", lit("document"))
      .withColumn("full_html", lit("")).withColumn("source_url", lit(""))
      .withColumn("file_extension", lit("pdf"))
      .withColumn("document_type", lit("PDF Document"))
    val out = Extract.latestQuarterReports(df, maxYear = 2026)
    assert(out.select($"company", $"url").as[(String, String)].collect().toSet ==
      Set(("a", "https://x/a1.pdf"), ("b", "https://x/b1.pdf")))
  }
}
