package graft.io

import java.nio.file.Files
import java.util.zip.ZipFile

import graft.SparkTestBase
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

class ExcelSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def readSheet(path: String): (Set[String], Seq[Seq[(String, String)]]) = {
    val zip = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zip.entries().asScala.map(_.getName).toSet
      val sheet = zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml"))
      val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder().parse(sheet)
      val rows = doc.getElementsByTagName("row")
      val parsed = (0 until rows.getLength).map { i =>
        val cells = rows.item(i).asInstanceOf[Element].getElementsByTagName("c")
        (0 until cells.getLength).map { j =>
          val c = cells.item(j).asInstanceOf[Element]
          val t = c.getAttribute("t")
          val text = c.getTextContent
          (t, text)
        }
      }
      (entries, parsed)
    } finally zip.close()
  }

  test("xlsx package has the required OOXML parts and survives parsing") {
    val dir = Files.createTempDirectory("graft-xlsx")
    val path = dir.resolve("companies.xlsx").toString
    val df = Seq(("3M", "MMM", 95.2, true), ("Apple", "AAPL", 180.5, false))
      .toDF("company", "ticker", "price", "active")
    ExcelSink.write(df, path, sheetName = "Dow30")
    val (entries, rows) = readSheet(path)
    assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml")
      .subsetOf(entries))
    // header + 2 data rows
    assert(rows.size == 3)
    assert(rows.head.map(_._2) == Seq("company", "ticker", "price", "active"))
    assert(rows(1) == Seq(("inlineStr", "3M"), ("inlineStr", "MMM"),
      ("", "95.2"), ("b", "1")))
    assert(rows(2) == Seq(("inlineStr", "Apple"), ("inlineStr", "AAPL"),
      ("", "180.5"), ("b", "0")))
  }

  test("xml-special characters and nulls round-trip safely") {
    val dir = Files.createTempDirectory("graft-xlsx2")
    val path = dir.resolve("esc.xlsx").toString
    val df = Seq((1L, "<a href=\"x\">R&D</a>"), (2L, null))
      .toDF("id", "label")
    ExcelSink.write(df, path)
    val (_, rows) = readSheet(path)
    assert(rows(1)(1)._2 == "<a href=\"x\">R&D</a>") // parser un-escapes
    assert(rows(2).size == 1)                        // null cell omitted
  }

  test("column reference arithmetic covers multi-letter columns") {
    assert(ExcelSink.colRef(0) == "A")
    assert(ExcelSink.colRef(25) == "Z")
    assert(ExcelSink.colRef(26) == "AA")
    assert(ExcelSink.colRef(27) == "AB")
    assert(ExcelSink.colRef(701) == "ZZ")
    assert(ExcelSink.colRef(702) == "AAA")
  }

  test("oversized input is refused, not silently truncated") {
    val dir = Files.createTempDirectory("graft-xlsx3")
    val path = dir.resolve("big.xlsx").toString
    val df = spark.range(20).toDF("id")
    intercept[IllegalArgumentException] {
      ExcelSink.write(df, path, maxRows = 10)
    }
  }

  test("xlsx file sniffs as a zip (consistent with the magic-byte table)") {
    val dir = Files.createTempDirectory("graft-xlsx4")
    val path = dir.resolve("m.xlsx").toString
    ExcelSink.write(Seq((1, "x")).toDF("a", "b"), path)
    val head = Files.readAllBytes(java.nio.file.Paths.get(path)).take(4)
    assert(graft.services.MagicBytes.sniff(head).contains("application/zip"))
  }
}
