package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class LinkFuncsSpec extends SparkTestBase {
  import spark.implicits._

  test("extension extraction") {
    val df = Seq("https://x.com/a.PDF", "https://x.com/a", "https://x.com/a.tar.gz",
                 "https://x.com/gov/governance-documents").toDF("href")
    val got = df.select(LinkFuncs.extension($"href")).as[String].collect().toSeq
    assert(got == Seq("pdf", "", "gz", ""))
  }

  test("classifyLink covers every branch") {
    val base = "https://ir.corp.com/index.html"
    val cases = Seq(
      ("https://ir.corp.com/q/report.pdf", "document"),  // extension
      ("https://other.com/download?id=3", "document"),   // keyword
      ("/about/team.html", "internal"),                  // relative
      ("https://ir.corp.com/contact", "internal"),       // same host
      ("https://elsewhere.com/page", "external"),
      ("javascript:void(0)", "invalid"),
      ("mailto:a@b.com", "invalid"),
      ("#top", "invalid"),
      ("", "invalid"))
    val df = cases.toDF("href", "want")
    val got = df.select(
      (LinkFuncs.classifyLink($"href", lit(base)) === $"want").as("ok"),
      $"href").collect()
    assert(got.forall(_.getBoolean(0)), got.filterNot(_.getBoolean(0)).mkString(","))
  }

  test("documentType mapping + default") {
    val df = Seq("pdf", "xlsx", "zzz", "").toDF("ext")
    val got = df.select(LinkFuncs.documentType($"ext")).as[String].collect().toSeq
    assert(got == Seq("PDF Document", "Excel Spreadsheet", "ZZZ File", "Unknown"))
  }

  test("sanitizeFilename never emits forbidden characters (property)") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('<', '>', ':', '"', '/', '\\', '|', '?', '*', ' ', '.'))).map(_.mkString)
    val samples = Gen.listOfN(200, gen).sample.get
    val got = samples.toDF("name")
      .select(LinkFuncs.sanitizeFilename($"name").as("s")).as[String].collect()
    assert(got.forall(s => !s.exists("<>:\"/\\|?*".contains(_))))
  }

  test("extractYearQuarter: patterns, bounds, absences") {
    val df = Seq(
      "Q3 2024 earnings call",
      "fourth-quarter 1999 report",
      "2022 2025 combined",        // max year wins
      "Results 3024 bogus",        // out of bounds year → null
      "1Q22 slide deck",           // 1q pattern, no 4-digit year
      "no dates here").toDF("t")
    val got = df.select(LinkFuncs.extractYearQuarter($"t", maxYear = 2026).as("yq"))
      .select($"yq.year", $"yq.quarter")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    assert(got == Seq(
      (Some(2024), Some(3)),
      (Some(1999), Some(4)),
      (Some(2025), None),
      (None, None),
      (None, Some(1)),
      (None, None)))
  }

  test("quarterlyScore counts keyword hits") {
    val df = Seq(("quarterly earnings", "report", "", "https://x/10-q.pdf"))
      .toDF("a", "b", "c", "d")
    val got = df.select(LinkFuncs.quarterlyScore($"a", $"b", $"c", $"d").as("s"))
      .as[Int].head()
    // quarterly, quarter (substring), earnings, 10-q → 4
    assert(got == 4)
  }

  test("isExcludedDomain") {
    val df = Seq("https://app.q4inc.com/x", "https://zoom.us/j/1", "https://corp.com/x")
      .toDF("u")
    val got = df.select(LinkFuncs.isExcludedDomain($"u")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false))
  }
}
