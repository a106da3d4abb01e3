package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** S13: Excel (.xlsx) sink — the reference's seed-table export
  * (`df.to_excel('dow30_companies.xlsx')`,
  * src/scrapers/get30DowTickers.py:243).
  *
  * XLSX is a zip of OOXML parts; this writes the minimal four-part
  * package (content types, package rels, workbook, one worksheet) with
  * the JDK's zip support — no third-party dependency. Strings are
  * inline (`t="inlineStr"`), numerics/booleans native.
  *
  * Excel is a REPORT format, not a data format: the sheet grid caps at
  * 1,048,576 rows and a workbook is a single file, so this sink
  * deliberately streams through the driver (`toLocalIterator`, one
  * partition in memory at a time) and refuses oversized inputs rather
  * than pretending to be a distributed sink. Large results belong in
  * parquet/CSV; this is for the bounded seed/report tables the
  * reference exports.
  */
object ExcelSink {

  /** 0-based column index → A1-style column letters. */
  private[io] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val pkgRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private def workbook(sheetName: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
       |</workbook>""".stripMargin

  private val wbRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  /** Write `df` (header row = column names) as a single .xlsx file.
    * Fails fast when the row count would exceed the sheet grid.
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
            maxRows: Int = 1048575): Unit = {
    val cols = df.columns
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", pkgRels)
      part("xl/workbook.xml", workbook(sheetName))
      part("xl/_rels/workbook.xml.rels", wbRels)
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""".stripMargin
          .getBytes("UTF-8"))
      def rowXml(rowNum: Int, values: Seq[Any]): String =
        s"""<row r="$rowNum">""" + values.zipWithIndex.map { case (v, i) =>
          cellXml(s"${colRef(i)}$rowNum", v)
        }.mkString + "</row>"
      zos.write(rowXml(1, cols.toSeq).getBytes("UTF-8"))
      var r = 2
      val it = df.toLocalIterator()
      while (it.hasNext) {
        if (r > maxRows + 1)
          throw new IllegalArgumentException(
            s"ExcelSink: more than $maxRows data rows — xlsx is a report " +
              "format; write parquet/CSV for data this size")
        val row = it.next()
        zos.write(rowXml(r, row.toSeq).getBytes("UTF-8"))
        r += 1
      }
      zos.write("</sheetData></worksheet>".getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
