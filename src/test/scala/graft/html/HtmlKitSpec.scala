package graft.html

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HtmlKitSpec extends SparkTestBase {
  import spark.implicits._

  val page =
    """<html><head><title>IR</title>
      |<script>var x = "<a href='/fake.pdf'>";</script>
      |<style>.a { color: red }</style></head>
      |<body>
      |<!-- comment <a href="/comment.pdf">x</a> -->
      |<svg><path d="M0 0"/></svg>
      |<img src="/logo.png"/>
      |<a href="/q2/earnings.pdf" title="Q2">Q2 2025 <b>Earnings</b></a>
      |<a href="https://ext.com/a.xlsx">Spreadsheet</a>
      |<a class="nav" href="/about">About us</a>
      |<a href="">empty</a>
      |<table class="wikitable">
      |<tr><th>Symbol</th><th>Company</th></tr>
      |<tr><td>MMM</td><td>3M</td></tr>
      |<tr><td>AXP</td><td>American Express</td></tr>
      |</table>
      |</body></html>""".stripMargin

  test("cleanHtml strips script/style/svg/img/comments but keeps anchors") {
    val c = HtmlKit.cleanHtml(page)
    assert(!c.contains("script") && !c.contains("color: red") &&
      !c.contains("<svg") && !c.contains("<img") && !c.contains("comment.pdf"))
    assert(c.contains("/q2/earnings.pdf") && c.contains("About us"))
  }

  test("extractLinks finds anchors with text/title; skips hrefless") {
    val links = HtmlKit.extractLinks(page)
    assert(links.map(_.href) ==
      Seq("/q2/earnings.pdf", "https://ext.com/a.xlsx", "/about"))
    val first = links.head
    assert(first.text == "Q2 2025 Earnings")
    assert(first.title == "Q2")
    assert(first.fullHtml.startsWith("<a href=\"/q2/earnings.pdf\""))
  }

  test("extractTables parses the wikitable") {
    val tables = HtmlKit.extractTables(page)
    assert(tables.size == 1)
    assert(tables.head == Seq(
      Seq("Symbol", "Company"), Seq("MMM", "3M"), Seq("AXP", "American Express")))
  }

  test("ExtractLinks generator explodes pages into link rows") {
    val df = Seq(("https://corp.com/ir", page)).toDF("url", "html")
    val links = df.select($"url",
      HtmlFuncs.extract_links($"html").as(Seq("href", "text", "title", "full_html")))
    assert(links.count() == 3)
    val got = links.select($"href").as[String].collect().toSeq
    assert(got == Seq("/q2/earnings.pdf", "https://ext.com/a.xlsx", "/about"))
  }

  test("ExtractTables generator emits (table_index, row_index, cells)") {
    val df = Seq(Tuple1(page)).toDF("html")
    val rows = df.select(
      HtmlFuncs.extract_tables($"html").as(Seq("table_index", "row_index", "cells")))
    assert(rows.count() == 3)
    assert(rows.filter($"row_index" === 1)
      .select($"cells").as[Seq[String]].head() == Seq("MMM", "3M"))
  }

  test("CleanHtml expression in DataFrame") {
    val df = Seq(Tuple1("<p>hi</p><script>x</script>")).toDF("h")
    assert(df.select(HtmlFuncs.clean_html($"h")).as[String].head() == "<p>hi</p>")
  }
}
