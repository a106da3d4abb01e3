package graft.services

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** External-effect operators (SURVEY U6–U9) behind narrow, serializable
  * traits. Production implementations would wrap a headless browser /
  * HTTP pool / LLM client per partition; the deterministic impls below
  * are fixture-backed so the whole pipeline is hermetic and
  * oracle-checkable. Instances are created per partition inside
  * `mapPartitions` — they must be `Serializable` and cheap to construct.
  */

/** Injected time source (SURVEY §7.4-1). The reference stamps each
  * pipeline stage with `datetime.now().isoformat()`
  * (src/simple_metadata_collector.py:40-117); a trait makes those
  * stamps deterministic under test and consistent across executors.
  */
trait Clock extends Serializable {
  def nowMillis(): Long
  /** ISO-8601 UTC with fixed width, so lexicographic min/max over
    * stamps is chronological (used for per-company download windows).
    */
  final def nowIso(): String =
    java.time.Instant.ofEpochMilli(nowMillis())
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
}

/** Wall-clock production impl. */
object SystemClock extends Clock {
  override def nowMillis(): Long = System.currentTimeMillis()
}

/** Deterministic test clock: each call advances by `stepMillis`. */
final class FixedClock(startMillis: Long, stepMillis: Long = 1000L)
    extends Clock {
  private val n = new java.util.concurrent.atomic.AtomicLong(0)
  override def nowMillis(): Long = startMillis + stepMillis * n.getAndIncrement()
}

/** Page fetcher (reference src/enhanced_selenium_scraper.py:208-252). */
trait PageFetcher extends Serializable {
  /** Rendered HTML for a URL, or None on fetch failure. */
  def fetch(url: String): Option[String]
}

/** Fixture-backed fetcher: URL → HTML from an in-memory map. */
final case class MapPageFetcher(pages: Map[String, String]) extends PageFetcher {
  override def fetch(url: String): Option[String] = pages.get(url)
}

/** Fetcher that also reports the final URL after redirects, so callers
  * can apply the redirect-domain rule (SURVEY P15). A production impl
  * wraps an HTTP client with allow_redirects and returns response.url.
  */
trait RedirectingPageFetcher extends PageFetcher {
  /** (finalUrl, html) after following redirects, or None on failure. */
  def fetchFinal(url: String): Option[(String, String)]
  override def fetch(url: String): Option[String] = fetchFinal(url).map(_._2)
}

/** Fixture-backed redirecting fetcher: URL → (finalUrl, HTML). */
final case class MapRedirectFetcher(pages: Map[String, (String, String)])
    extends RedirectingPageFetcher {
  override def fetchFinal(url: String): Option[(String, String)] = pages.get(url)
}

/** Fetcher serving `file:` URLs from local disk (integration tests). */
final class LocalFilePageFetcher extends PageFetcher {
  override def fetch(url: String): Option[String] = {
    val p = if (url.startsWith("file:")) url.stripPrefix("file:") else url
    val path = Paths.get(p)
    if (Files.isRegularFile(path))
      Some(new String(Files.readAllBytes(path), "UTF-8"))
    else None
  }
}

/** Download result (reference src/download_reports.py:459-603). */
final case class FileResult(
    url: String,
    path: String,
    size: Long,
    checksum: String,
    contentType: String,
    ok: Boolean,
    error: String)

/** Byte-stream downloader (SURVEY U8/S8/S14). */
trait Downloader extends Serializable {
  def download(url: String, destDir: String, filename: String): FileResult
}

/** Row-at-a-time mirror of `graft.expr.DownloadFuncs` for service-side
  * use (reference src/download_reports.py:349-418). The column pipeline
  * is the scale path; this kernel exists for per-row service code like
  * `Orchestrator.download`. `FilenameConsistencySpec` pins the two
  * implementations together.
  */
object FilenameKernel {
  private val starRe =
    "(?i)filename\\*\\s*=\\s*[^']+'[^']+'\\s*([^;]+)".r
  private val plainRe = "(?i)filename\\s*=\\s*\"?([^\";]+)\"?".r

  def cdFilename(cd: String): Option[String] =
    if (cd == null || cd.isEmpty) None
    else starRe.findFirstMatchIn(cd)
      .map(_.group(1).trim.replaceAll("^\"+|\"+$", "").trim)
      .orElse(plainRe.findFirstMatchIn(cd).map(_.group(1).trim))
      .filter(_.nonEmpty)

  def lastSegment(url: String): String = {
    val path =
      if (url.contains("://"))
        "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)".r
          .findFirstMatchIn(url).map(_.group(1)).getOrElse("")
      else url.takeWhile(c => c != '?' && c != '#')
    val stripped = path.reverse.dropWhile(_ == '/').reverse
    stripped.substring(stripped.lastIndexOf('/') + 1)
  }

  private def segmentExt(seg: String): String = {
    val i = seg.lastIndexOf('.')
    if (i > 0) seg.substring(i) else ""
  }

  def extensionFromContentType(contentType: String, lastSegment: String): String = {
    val urlExt = segmentExt(lastSegment)
    if (urlExt.nonEmpty) return urlExt
    val ct = Option(contentType).getOrElse("").toLowerCase
    if (ct.contains("pdf")) ".pdf"
    else if (ct.contains("html") || ct.contains("htm")) ".html"
    else if (ct.contains("spreadsheetml") || ct.contains("excel") ||
      ct.contains("xlsx")) ".xlsx"
    else if (ct.contains("zip")) ".zip"
    else if (ct.contains("msword") || ct.contains("wordprocessingml") ||
      ct.contains("docx")) ".docx"
    else if (ct.contains("plain") || ct.contains("text/")) ".txt"
    else ".bin"
  }

  /** Priority chain: metadata name → Content-Disposition → URL segment
    * → `download{ext}`, then sanitize (download_reports.py:389-418,536).
    */
  def build(url: String, contentDisposition: String, contentType: String,
            title: String, year: Int, quarter: Int): String = {
    val seg = lastSegment(url)
    val ext = extensionFromContentType(contentType, seg)
    val raw =
      if (title != null && title.nonEmpty && year != 0 && quarter != 0)
        s"${title}_${year}Q$quarter$ext"
      else cdFilename(contentDisposition).getOrElse {
        if (seg.nonEmpty) { if (segmentExt(seg).nonEmpty) seg else seg + ext }
        else s"download$ext"
      }
    raw.replaceAll("[<>:\"/\\\\|?*]", "_")
  }
}

/** First-bytes content sniffing (reference src/download_reports.py:
  * 517-530 peeks the first chunk for `%PDF`). Used to correct a lying
  * or absent Content-Type after download.
  */
object MagicBytes {
  def sniff(first: Array[Byte]): Option[String] = {
    def startsWith(p: Array[Byte]) =
      first.length >= p.length && p.indices.forall(i => first(i) == p(i))
    if (startsWith("%PDF".getBytes("US-ASCII"))) Some("application/pdf")
    else if (startsWith(Array[Byte](0x50, 0x4b, 0x03, 0x04))) Some("application/zip")
    else if (startsWith(Array[Byte](0x1f, 0x8b.toByte))) Some("application/gzip")
    else {
      val head = new String(first.take(256), "UTF-8").trim.toLowerCase
      if (head.startsWith("<!doctype html") || head.startsWith("<html"))
        Some("text/html")
      else None
    }
  }
}

/** Two-phase download (reference src/download_reports.py:496-513):
  * a cheap primary attempt; when it fails — or "succeeds" with an HTML
  * payload where a document was expected (the interstitial/anti-bot
  * signature, `:509`) — warm up the origin (cookie acquisition, `:496-501`)
  * and retry through the fallback (the reference's alternate-Accept
  * profile). Both phases are plain Downloaders, so profiles (headers,
  * referers) live in the impls, and the decorator stays testable.
  */
final class TwoPhaseDownloader(
    primary: Downloader, fallback: Downloader,
    warmUp: String => Unit = _ => ()) extends Downloader {

  private def origin(url: String): String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*".r.findFirstIn(url).getOrElse(url)

  override def download(url: String, destDir: String, filename: String): FileResult = {
    val first = primary.download(url, destDir, filename)
    // HTML where the filename promises a document = likely
    // interstitial; a null/empty filename promises nothing, so it
    // cannot flag (HttpDownloader accepts null and derives a name)
    val interstitial = first.ok &&
      filename != null && filename.nonEmpty &&
      !filename.toLowerCase.endsWith(".html") &&
      first.contentType.startsWith("text/html")
    if (first.ok && !interstitial) first
    else {
      warmUp(origin(url))
      val second = fallback.download(url, destDir, filename)
      if (second.ok) second
      else if (first.ok) first // keep the suspicious payload over nothing
      else second
    }
  }
}

/** Retry-with-backoff decorator for any Downloader (reference
  * `_session_with_retries`, src/download_reports.py:439-449: total=3,
  * backoff_factor=0.5 → 0.5s, 1s between attempts). The sleeper is
  * injectable so specs assert the schedule without waiting.
  */
final class RetryingDownloader(
    inner: Downloader, attempts: Int = 3, backoffMillis: Long = 500,
    sleeper: Long => Unit = Thread.sleep) extends Downloader {
  override def download(url: String, destDir: String, filename: String): FileResult = {
    var last: FileResult = FileResult(url, "", 0L, "", "", ok = false, "no attempt")
    var i = 0
    while (i < attempts) {
      last = inner.download(url, destDir, filename)
      if (last.ok) return last
      i += 1
      if (i < attempts) sleeper(backoffMillis << (i - 1))
    }
    last
  }
}

/** Deterministic downloader: `file:` URLs are copied from local disk
  * with streamed MD5 (4 KiB chunks like the reference's checksum loop,
  * src/simple_metadata_collector.py:132-145); anything else fails like
  * a network error would.
  */
final class LocalFileDownloader extends Downloader {
  override def download(url: String, destDir: String, filename: String): FileResult = {
    try {
      if (!url.startsWith("file:"))
        return FileResult(url, "", 0L, "", "", ok = false, "unsupported scheme")
      val src = Paths.get(url.stripPrefix("file:"))
      if (!Files.isRegularFile(src))
        return FileResult(url, "", 0L, "", "", ok = false, "not found")
      Files.createDirectories(Paths.get(destDir))
      val dest = Paths.get(destDir, filename)
      val md = MessageDigest.getInstance("MD5")
      val in = Files.newInputStream(src)
      val out = Files.newOutputStream(dest)
      try {
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) { md.update(buf, 0, n); out.write(buf, 0, n) }
          n = in.read(buf)
        }
      } finally { in.close(); out.close() }
      val hex = md.digest().map("%02x".format(_)).mkString
      // magic-byte sniff beats the extension guess when they disagree
      // (reference peeks the first chunk for %PDF, download_reports.py:517)
      val head = new Array[Byte](256)
      val hin = Files.newInputStream(dest)
      val hn = try hin.read(head) finally hin.close()
      val sniffed = MagicBytes.sniff(head.take(math.max(hn, 0)))
      FileResult(url, dest.toString, Files.size(dest), hex,
        sniffed.getOrElse(contentTypeFor(filename)), ok = true, "")
    } catch {
      case e: Exception =>
        FileResult(url, "", 0L, "", "", ok = false, String.valueOf(e.getMessage))
    }
  }

  private def contentTypeFor(name: String): String = {
    val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase
    Map("pdf" -> "application/pdf", "html" -> "text/html",
        "htm" -> "text/html", "csv" -> "text/csv",
        "json" -> "application/json")
      .getOrElse(ext, "application/octet-stream")
  }
}

/** Structured report extraction (SURVEY U6) — the reference delegates
  * "latest quarter only" to an LLM prompt
  * (src/extract_reports.py:126-137); the deterministic impl executes
  * the equivalent relational query (U5 → A2 → W4) and is the test/
  * oracle backend. A production impl would call an LLM with the same
  * output schema.
  */
trait StructuredExtractor extends Serializable {
  def extract(links: Seq[graft.model.DocumentLink]): Seq[graft.model.Report]
}

/** Scala-side year/quarter extraction — the same rules as
  * `graft.expr.LinkFuncs.extractYearQuarter`'s column pipeline, for
  * per-row service use. `ExtractorConsistencySpec` pins the two
  * implementations together on the reference fixtures.
  */
object YearQuarterKernel {
  private val yearRe = "(19|20)\\d{2}".r
  private val qNumRe = "q([1-4])(?![0-9a-z])".r
  private val numQRe = "(?<![0-9])([1-4])q(?![a-z])".r
  private val wordQRe = "(first|second|third|fourth)[ -]quarter".r
  private val words = Map("first" -> 1, "second" -> 2, "third" -> 3, "fourth" -> 4)
  private val joint1 = "q([1-4])[^0-9]{0,10}((19|20)\\d{2})".r
  private val joint2 = "((19|20)\\d{2})[^0-9]{1,10}q([1-4])(?![0-9a-z])".r
  private val joint3 = "(?<![0-9])([1-4])q[^0-9]{1,10}((19|20)\\d{2})".r
  private val joint4 = "(first|second|third|fourth)[ -]quarter[^0-9]{0,30}((19|20)\\d{2})".r

  /** (year, quarter), either possibly None. */
  def yearQuarter(text: String, maxYear: Int): (Option[Int], Option[Int]) = {
    val t = text.toLowerCase
    def ok(y: Int) = y >= 1990 && y <= maxYear
    val joint =
      joint1.findAllMatchIn(t).map(m => (m.group(2).toInt, m.group(1).toInt)) ++
      joint2.findAllMatchIn(t).map(m => (m.group(1).toInt, m.group(3).toInt)) ++
      joint3.findAllMatchIn(t).map(m => (m.group(2).toInt, m.group(1).toInt)) ++
      joint4.findAllMatchIn(t).map(m => (m.group(2).toInt, words(m.group(1))))
    val jointOk = joint.filter(p => ok(p._1)).toSeq
    if (jointOk.nonEmpty) {
      val (y, q) = jointOk.max
      (Some(y), Some(q))
    } else {
      val years = yearRe.findAllIn(t).map(_.toInt).filter(ok).toSeq
      val quarters =
        (qNumRe.findAllMatchIn(t).map(_.group(1).toInt) ++
         numQRe.findAllMatchIn(t).map(_.group(1).toInt) ++
         wordQRe.findAllMatchIn(t).map(m => words(m.group(1)))).toSeq
      (years.sorted.lastOption, quarters.sorted.lastOption)
    }
  }
}

/** Deterministic U6 impl: the latest-quarter relational query (U5 → A2
  * → W4) executed per-company on the service side — the rule-based
  * stand-in for the reference's LLM call. A production impl would be a
  * drop-in replacement calling an LLM with `Report` as the response
  * schema.
  */
final class RuleBasedExtractor(maxYear: Int, minYear: Int = 2023)
    extends StructuredExtractor {
  import graft.model.{DocumentLink, Report}

  override def extract(links: Seq[DocumentLink]): Seq[Report] = {
    val docs = links
      .filter(_.link_type == "document")
      .groupBy(_.href).map(_._2.head).toSeq  // dedup by url, keep first
      .map { l =>
        val (y, q) = YearQuarterKernel.yearQuarter(
          Seq(l.text, l.title, l.href).mkString(" "), maxYear)
        (l, y, q)
      }
      .filter { case (l, y, _) =>
        !(l.file_extension == "pdf" && y.exists(_ < minYear)) }
    val dated = docs.collect { case (_, Some(y), q) => (y, q.getOrElse(-1)) }
    if (dated.isEmpty) {
      docs.map { case (l, y, q) => mkReport(l, y.getOrElse(maxYear), q.getOrElse(4)) }
    } else {
      val (ly, lqRaw) = dated.max
      val lq = if (lqRaw == -1) 4 else lqRaw
      docs.filter { case (_, y, q) =>
        y.isEmpty || y.exists(_ > ly) ||
          (y.contains(ly) && (q.isEmpty || q.exists(_ >= lq)))
      }.map { case (l, y, q) => mkReport(l, y.getOrElse(ly), q.getOrElse(lq)) }
    }
  }

  private def mkReport(l: DocumentLink, y: Int, q: Int): Report =
    Report(
      title = if (l.text.trim.nonEmpty) l.text.trim else l.title,
      category = l.document_type, url = l.href, year = y, quarter = q)
}

/** Token-bucket rate limiter, per-JVM (SURVEY U9). The reference uses a
  * global file lock with a 30 s minimum gap (src/extract_reports.py:
  * 98-108); on a cluster this becomes per-executor — a documented
  * divergence: total request rate = executors × rate.
  */
final class RateLimiter(minGapMillis: Long) extends Serializable {
  @volatile private var lastCall = 0L
  def acquire(): Unit = synchronized {
    val now = System.currentTimeMillis()
    val wait = lastCall + minGapMillis - now
    if (wait > 0) Thread.sleep(wait)
    lastCall = System.currentTimeMillis()
  }
}
