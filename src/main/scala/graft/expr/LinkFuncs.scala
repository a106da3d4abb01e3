package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column logic for the link-harvesting surface — the reference's
  * per-link classification/derivation/scoring, re-expressed as Catalyst
  * column expressions so they stay inside whole-stage codegen.
  *
  * Reference semantics (file:line into /root/reference/):
  *  - extension extraction  src/enhanced_selenium_scraper.py:54-58
  *  - document-type label   src/enhanced_selenium_scraper.py:60-86
  *  - link classification   src/enhanced_selenium_scraper.py:509-543
  *  - excluded domains      src/enhanced_selenium_scraper.py:141-150
  *  - year/quarter extract  src/enhanced_selenium_scraper.py:299-371
  *  - link scoring          src/enhanced_selenium_scraper.py:634-696
  *  - filename sanitize     src/download_reports.py:478
  */
object LinkFuncs {

  /** Extensions that mark a link as a downloadable document. */
  val documentExtensions: Seq[String] =
    Seq("pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx",
        "zip", "rar", "csv", "txt", "rtf", "xml", "json")

  /** href keywords that mark a document link even without an extension. */
  val documentKeywords: Seq[String] =
    Seq("file", "download", "document", "attachment")

  /** Domains the crawl never follows (vendor/webcast hosts). */
  val excludedDomains: Seq[String] =
    Seq("q4inc.com", "q4cdn.com", "zoom.us", "webcasts.com",
        "veracast.com", "twitter.com", "facebook.com", "linkedin.com")

  /** extension → human label (18-entry map in the reference). */
  val documentTypeLabels: Map[String, String] = Map(
    "pdf" -> "PDF Document", "doc" -> "Word Document",
    "docx" -> "Word Document", "xls" -> "Excel Spreadsheet",
    "xlsx" -> "Excel Spreadsheet", "ppt" -> "PowerPoint Presentation",
    "pptx" -> "PowerPoint Presentation", "zip" -> "ZIP Archive",
    "rar" -> "RAR Archive", "csv" -> "CSV File", "txt" -> "Text File",
    "rtf" -> "Rich Text Document", "xml" -> "XML File",
    "json" -> "JSON File", "htm" -> "Web Page", "html" -> "Web Page",
    "aspx" -> "Web Page", "php" -> "Web Page")

  /** Quarterly-report keywords used for promising-link scoring. */
  val quarterlyKeywords: Seq[String] =
    Seq("quarterly", "quarter", "earnings", "financial", "results",
        "sec-filings", "sec filings", "10-q", "10-k", "annual report",
        "investor", "presentation")

  /** `href.split('.')[-1].lower()` guarded on containing a dot and the
    * tail looking like an extension (letters/digits, ≤ 5 chars).
    */
  def extension(href: Column): Column = {
    val tail = lower(substring_index(href, ".", -1))
    when(href.contains(".") && tail.rlike("^[a-z0-9]{1,5}$"), tail)
      .otherwise(lit(""))
  }

  /** link_type ∈ {document, internal, external, invalid} (SURVEY P2). */
  def classifyLink(href: Column, baseUrl: Column): Column = {
    val h = lower(href)
    val isDoc = documentExtensions
      .map(e => h.rlike(s"\\.$e([?#].*)?$$"))
      .reduce(_ || _) ||
      documentKeywords.map(k => h.contains(k)).reduce(_ || _)
    when(href.isNull || trim(href) === "" || h.startsWith("javascript:") ||
           h.startsWith("mailto:") || h.startsWith("#"), "invalid")
      .when(isDoc, "document")
      .when(!h.startsWith("http"), "internal")
      .when(UrlFuncs.same_host(href, baseUrl), "internal")
      .otherwise("external")
  }

  /** extension → label, default "{EXT} File" (SURVEY P3). */
  def documentType(ext: Column): Column = {
    val m = typedLit(documentTypeLabels)
    when(ext === "", "Unknown")
      .otherwise(coalesce(element_at(m, ext), concat(upper(ext), lit(" File"))))
  }

  /** True for hosts under any excluded domain (SURVEY P7). */
  def isExcludedDomain(url: Column): Column = {
    val host = UrlFuncs.url_host(url)
    val doms = array(excludedDomains.map(lit): _*)
    coalesce(exists(doms, d => host.contains(d)), lit(false))
  }

  /** `re.sub(r'[<>:"/\\|?*]', '_', name)` (SURVEY P14). */
  def sanitizeFilename(name: Column): Column =
    regexp_replace(name, "[<>:\"/\\\\|?*]", "_")

  /** All plausible 4-digit years in a string, bounded to
    * [1990, maxYear] like the reference's sanity filter
    * (src/enhanced_selenium_scraper.py:357-365).
    */
  def extractYears(text: Column, maxYear: Int): Column =
    filter(
      transform(regexp_extract_all(text, lit("(19|20)\\d{2}"), lit(0)),
                y => y.cast("int")),
      y => y >= 1990 && y <= maxYear)

  /** All quarter numbers from Q1/1Q/first-quarter style patterns.
    * Boundary guards keep "1q22" → 1 (not the 2 from "q22") and skip
    * vendor tokens like "q4inc".
    */
  def extractQuarters(text: Column): Column = {
    val t = lower(text)
    val qNum = transform(
      regexp_extract_all(t, lit("q([1-4])(?![0-9a-z])"), lit(1)), q => q.cast("int"))
    val numQ = transform(
      regexp_extract_all(t, lit("(?<![0-9])([1-4])q(?![a-z])"), lit(1)), q => q.cast("int"))
    val words = typedLit(Map("first" -> 1, "second" -> 2, "third" -> 3, "fourth" -> 4))
    val wordQ = transform(
      regexp_extract_all(t, lit("(first|second|third|fourth)[ -]quarter"), lit(1)),
      w => element_at(words, w))
    concat(qNum, numQ, wordQ)
  }

  /** Joint (year, quarter) pairs where a quarter mention co-occurs with
    * a year ("Q2 2025", "2025 Q2", "2Q+2025", "Fourth-Quarter … 2024").
    * Association beats the reference's independent max-year × max-
    * quarter heuristic, which fabricates (2025, 4) from "Fourth-Quarter
    * 2024 Results; Provides 2025 Guidance" — the joint rule re-derives
    * the reference's committed LLM output exactly (GoldenReplaySpec).
    */
  def jointYearQuarters(text: Column, maxYear: Int): Column = {
    val t = lower(text)
    val words = typedLit(Map("first" -> 1, "second" -> 2, "third" -> 3, "fourth" -> 4))
    val yearOf = (m: Column) => regexp_extract(m, "(19|20)\\d{2}", 0).cast("int")
    def pairs(pattern: String, qOf: Column => Column) =
      transform(regexp_extract_all(t, lit(pattern), lit(0)),
        m => struct(yearOf(m).as("year"), qOf(m).as("quarter")))
    val p1 = pairs("q([1-4])[^0-9]{0,10}(19|20)\\d{2}",
      m => regexp_extract(m, "q([1-4])", 1).cast("int"))
    val p2 = pairs("(19|20)\\d{2}[^0-9]{1,10}q([1-4])(?![0-9a-z])",
      m => regexp_extract(m, "q([1-4])", 1).cast("int"))
    val p3 = pairs("(?<![0-9])([1-4])q[^0-9]{1,10}(19|20)\\d{2}",
      m => regexp_extract(m, "([1-4])q", 1).cast("int"))
    val p4 = pairs("(first|second|third|fourth)[ -]quarter[^0-9]{0,30}(19|20)\\d{2}",
      m => element_at(words, regexp_extract(m, "(first|second|third|fourth)", 1)))
    filter(concat(p1, p2, p3, p4),
      p => p.getField("year").between(1990, maxYear))
  }

  /** `struct(year, quarter)` for a document string (SURVEY U5/A3): the
    * max joint (year, quarter) pair when any exists, otherwise the
    * independent max year / max quarter with nulls when absent. A pure
    * higher-order-function pipeline — no UDF, fully codegen-eligible.
    */
  def extractYearQuarter(text: Column, maxYear: Int): Column = {
    val joint = jointYearQuarters(text, maxYear)
    val best = array_max(joint)
    struct(
      coalesce(best.getField("year"),
        array_max(extractYears(text, maxYear))).as("year"),
      when(size(joint) > 0, best.getField("quarter"))
        .otherwise(array_max(extractQuarters(text))).as("quarter"))
  }

  /** Sum of quarterly-keyword hits across the given fields (SURVEY A6):
    * `aggregate` over a literal keyword array — map-side, no shuffle.
    */
  def quarterlyScore(fields: Column*): Column = {
    val kw = array(quarterlyKeywords.map(lit): _*)
    val blob = lower(concat_ws(" ", fields: _*))
    aggregate(kw, lit(0),
      (acc, k) => acc + when(blob.contains(k), 1).otherwise(0))
  }

  /** IR-page indicator score: keyword hits in text + 3 title bonus
    * (SURVEY A5, find_IR_pgs_v1.py:98-112).
    */
  def irIndicatorScore(pageText: Column, title: Column): Column = {
    val kws = Seq("investor relations", "quarterly results", "annual report",
                  "sec filings", "earnings", "shareholder", "dividend",
                  "financial information")
    val t = lower(pageText)
    val hits = aggregate(array(kws.map(lit): _*), lit(0),
      (acc, k) => acc + when(t.contains(k), 1).otherwise(0))
    hits + when(lower(title).contains("investor"), 3).otherwise(0)
  }
}
