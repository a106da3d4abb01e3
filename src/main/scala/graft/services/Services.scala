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

/** Page fetcher (reference src/enhanced_selenium_scraper.py:208-252). */
trait PageFetcher extends Serializable {
  /** Rendered HTML for a URL, or None on fetch failure. */
  def fetch(url: String): Option[String]
}

/** Fixture-backed fetcher: URL → HTML from an in-memory map. */
final case class MapPageFetcher(pages: Map[String, String]) extends PageFetcher {
  override def fetch(url: String): Option[String] = pages.get(url)
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
      FileResult(url, dest.toString, Files.size(dest), hex,
        contentTypeFor(filename), ok = true, "")
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
  def extract(links: Seq[(String, String, String)]): Seq[graft.model.Report]
  // (url, text, title) in — Report rows out
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
