package graft.html

import scala.collection.mutable.ArrayBuffer

/** Dependency-free HTML kernels (the container has no jsoup): a small
  * scanner good enough for the reference's fixture corpus — anchor/table
  * extraction and LLM-prep cleaning.
  *
  * Reference semantics:
  *  - clean_for_llm        /root/reference/src/enhanced_selenium_scraper.py:573-596
  *  - extract_all_links    /root/reference/src/enhanced_selenium_scraper.py:698-708
  *  - wikitable parsing    /root/reference/src/scrapers/get30DowTickers.py:31-143
  */
object HtmlKit {

  final case class RawLink(href: String, text: String, title: String, fullHtml: String)

  private val blockStrip = Seq("script", "style", "svg", "noscript", "iframe")

  /** Strip script/style/svg/noscript/iframe blocks (with content),
    * comments, `<img>` tags, and collapse blank runs — the reference's
    * LLM-payload cleaning. Tag-scanner state machine, single pass.
    */
  def cleanHtml(html: String): String = {
    if (html == null) return null
    val out = new java.lang.StringBuilder(html.length)
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lower.startsWith("<!--", i)) {
          val end = lower.indexOf("-->", i)
          i = if (end < 0) n else end + 3
        } else {
          val stripped = blockStrip.find(t => lower.startsWith("<" + t, i) &&
            (i + t.length + 1 >= n || !Character.isLetterOrDigit(lower.charAt(i + t.length + 1))))
          stripped match {
            case Some(tag) =>
              val close = lower.indexOf("</" + tag, i)
              if (close < 0) i = n
              else {
                val gt = lower.indexOf('>', close)
                i = if (gt < 0) n else gt + 1
              }
            case None =>
              if (lower.startsWith("<img", i)) {
                val gt = lower.indexOf('>', i)
                i = if (gt < 0) n else gt + 1
              } else {
                val gt = lower.indexOf('>', i)
                if (gt < 0) { i = n }
                else { out.append(html, i, gt + 1); i = gt + 1 }
              }
          }
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString.replaceAll("[ \\t]*\\n\\s*\\n+", "\n").trim
  }

  /** Drop script/style/svg/noscript/iframe blocks and comments so the
    * anchor/table scanners never see markup inside them (a DOM parser
    * would not surface those as elements either).
    */
  private def stripNonContent(html: String): String = {
    val out = new java.lang.StringBuilder(html.length)
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (lower.startsWith("<!--", i)) {
          val end = lower.indexOf("-->", i)
          i = if (end < 0) n else end + 3
        } else {
          blockStrip.find(t => lower.startsWith("<" + t, i) &&
            (i + t.length + 1 >= n || !Character.isLetterOrDigit(lower.charAt(i + t.length + 1)))) match {
            case Some(tag) =>
              val close = lower.indexOf("</" + tag, i)
              if (close < 0) i = n
              else {
                val gt = lower.indexOf('>', close)
                i = if (gt < 0) n else gt + 1
              }
            case None =>
              out.append(html.charAt(i)); i += 1
          }
        }
      } else { out.append(html.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def attr(tag: String, name: String): String = {
    val l = tag.toLowerCase
    var i = l.indexOf(name + "=")
    while (i > 0 && Character.isLetterOrDigit(l.charAt(i - 1))) {
      i = l.indexOf(name + "=", i + 1)
    }
    if (i < 0) return ""
    var j = i + name.length + 1
    if (j >= tag.length) return ""
    tag.charAt(j) match {
      case q @ ('"' | '\'') =>
        val end = tag.indexOf(q, j + 1)
        if (end < 0) tag.substring(j + 1) else tag.substring(j + 1, end)
      case _ =>
        val end = tag.indexWhere(c => c == ' ' || c == '>' || c == '\t', j)
        if (end < 0) tag.substring(j) else tag.substring(j, end)
    }
  }

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim

  /** All `<a href=…>` elements: (href, anchor text, title attr, outer
    * HTML). One page row explodes to N link rows downstream.
    */
  def extractLinks(htmlRaw: String): Seq[RawLink] = {
    if (htmlRaw == null) return Nil
    val html = stripNonContent(htmlRaw)
    val out = ArrayBuffer.empty[RawLink]
    val lower = html.toLowerCase
    var i = lower.indexOf("<a")
    val n = html.length
    while (i >= 0 && i < n) {
      val valid = i + 2 < n && !Character.isLetterOrDigit(lower.charAt(i + 2))
      if (valid) {
        val openEnd = html.indexOf('>', i)
        if (openEnd < 0) { i = -1 }
        else {
          val close = lower.indexOf("</a", openEnd)
          val inner = if (close < 0) "" else html.substring(openEnd + 1, close)
          val outerEnd =
            if (close < 0) openEnd + 1
            else math.min(n, { val g = lower.indexOf('>', close); if (g < 0) n else g + 1 })
          val tag = html.substring(i, openEnd + 1)
          val href = attr(tag, "href")
          if (href.nonEmpty) {
            out += RawLink(href, stripTags(inner), attr(tag, "title"),
              html.substring(i, outerEnd))
          }
          i = lower.indexOf("<a", outerEnd)
        }
      } else {
        i = lower.indexOf("<a", i + 2)
      }
    }
    out.toSeq
  }

  /** `<table>` rows as cell-text matrices (wikitable scrape, SURVEY U4). */
  def extractTables(htmlRaw: String): Seq[Seq[Seq[String]]] = {
    if (htmlRaw == null) return Nil
    val html = stripNonContent(htmlRaw)
    val tables = ArrayBuffer.empty[Seq[Seq[String]]]
    val lower = html.toLowerCase
    var t = lower.indexOf("<table")
    while (t >= 0) {
      val end = lower.indexOf("</table", t)
      val body = if (end < 0) html.substring(t) else html.substring(t, end)
      val bodyLower = body.toLowerCase
      val rows = ArrayBuffer.empty[Seq[String]]
      var r = bodyLower.indexOf("<tr")
      while (r >= 0) {
        val rEnd0 = bodyLower.indexOf("</tr", r)
        val rEnd = if (rEnd0 < 0) body.length else rEnd0
        val rowHtml = body.substring(r, rEnd)
        val rowLower = rowHtml.toLowerCase
        val cells = ArrayBuffer.empty[String]
        var c0 = -1
        val cellPat = "(<t[dh])".r
        for (m <- cellPat.findAllMatchIn(rowLower)) {
          val start = m.start
          val open = rowHtml.indexOf('>', start)
          if (open >= 0) {
            val cEnd0 = rowLower.indexOf("</t", open)
            val cEnd = if (cEnd0 < 0) rowHtml.length else cEnd0
            cells += stripTags(rowHtml.substring(open + 1, cEnd))
          }
          c0 = start
        }
        if (cells.nonEmpty) rows += cells.toSeq
        r = bodyLower.indexOf("<tr", rEnd + 1)
      }
      if (rows.nonEmpty) tables += rows.toSeq
      t = if (end < 0) -1 else lower.indexOf("<table", end)
    }
    tables.toSeq
  }
}
