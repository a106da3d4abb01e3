package graft.services

import java.net.{CookieManager, CookiePolicy, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.time.Duration

/** Production (network) implementations of the U7/U8 service traits on
  * `java.net.http` — the piece a real user plugs in where the hermetic
  * test path uses the fixture-backed impls in [[Services]].
  *
  * Behavior mirrors the reference's requests-based client:
  *  - browser-profile headers with a PDF-friendly Accept and an
  *    alternate HTML-friendly Accept for the fallback attempt
  *    (download_reports.py:422-437)
  *  - Referer = the document's origin (or an explicit parent page)
  *    (download_reports.py:452-456, 496-513)
  *  - redirects followed; cookies shared across warm-up / primary /
  *    fallback through one CookieManager per [[HttpContext]] — the
  *    warm-up request exists precisely to acquire origin cookies
  *    (download_reports.py:496-501)
  *  - non-2xx responses are failures (raise_for_status), which the
  *    [[RetryingDownloader]] decorator turns into the reference's
  *    retry schedule (total=3, backoff 0.5 s → 0.5/1 s,
  *    download_reports.py:439-449)
  *  - bodies stream to disk in 64 KiB chunks with an incremental MD5
  *    (download_reports.py:536-545; simple_metadata_collector.py:132-145)
  *    — the payload is never held in memory
  *  - the first chunk is magic-byte sniffed and overrides a lying or
  *    absent Content-Type (download_reports.py:517-530)
  *
  * None of this is used by `SparkEntry` queries or the driver contract
  * — tests exercise it against a local in-process HTTP server
  * (HttpServicesSpec), keeping the build hermetic.
  *
  * Cluster shape: instances are constructed per partition (the traits
  * are Serializable; the HttpClient itself is `@transient lazy`, so an
  * executor builds its own client on first use after deserialization).
  */
object HttpServices {

  /** Reference's `_browsery_headers()` (download_reports.py:422-431). */
  val BrowseryHeaders: Seq[(String, String)] = Seq(
    "User-Agent" -> ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) " +
      "AppleWebKit/537.36 (KHTML, like Gecko) " +
      "Chrome/120.0.0.0 Safari/537.36"),
    "Accept" -> "application/pdf,application/octet-stream;q=0.9,*/*;q=0.8",
    "Accept-Language" -> "en-US,en;q=0.9",
    "Cache-Control" -> "no-cache",
    "Pragma" -> "no-cache")

  /** Reference's `_alt_accept_headers()` (download_reports.py:434-437). */
  val AltAcceptHeaders: Seq[(String, String)] =
    BrowseryHeaders.map {
      case ("Accept", _) =>
        "Accept" -> "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"
      case kv => kv
    }

  private[services] def origin(url: String): String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*".r.findFirstIn(url).getOrElse(url)

  /** The reference's full robust download path, composed from the
    * existing decorators: retry schedule around (primary attempt →
    * on failure or interstitial HTML: warm-up the origin for cookies,
    * retry with the alternate Accept profile). One cookie jar spans
    * all three request kinds.
    */
  def robustDownloader(connectTimeout: Duration = Duration.ofSeconds(20),
                       requestTimeout: Duration = Duration.ofSeconds(30),
                       attempts: Int = 3, backoffMillis: Long = 500,
                       sleeper: Long => Unit = Thread.sleep): Downloader = {
    val ctx = new HttpContext(connectTimeout)
    new RetryingDownloader(
      new TwoPhaseDownloader(
        primary = new HttpDownloader(ctx, BrowseryHeaders, requestTimeout),
        fallback = new HttpDownloader(ctx, AltAcceptHeaders, requestTimeout),
        warmUp = ctx.warmUp(_, requestTimeout)),
      attempts, backoffMillis, sleeper)
  }
}

/** One HTTP client + cookie jar, shared by every request a logical
  * download session makes (warm-up, primary, fallback) — cookies
  * acquired by the warm-up are presented on the retry, which is the
  * whole point of the warm-up (download_reports.py:496-513).
  *
  * Serializable by rebuilding: the client is `@transient lazy`, so a
  * deserialized copy on an executor starts with a fresh client and an
  * empty jar (cookie state is per-executor session state, not data).
  */
final class HttpContext(connectTimeout: Duration = Duration.ofSeconds(20))
    extends Serializable {

  @transient private lazy val clientRef: HttpClient =
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(connectTimeout)
      .cookieHandler(new CookieManager(null, CookiePolicy.ACCEPT_ALL))
      .build()

  private[services] def client: HttpClient = clientRef

  private[services] def get[T](url: String, headers: Seq[(String, String)],
                               timeout: Duration,
                               handler: HttpResponse.BodyHandler[T])
      : HttpResponse[T] = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET().timeout(timeout)
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), handler)
  }

  /** Best-effort cookie-acquisition GET against an origin; failures
    * are non-fatal (reference: "Warm-up skipped (not fatal)").
    */
  def warmUp(originUrl: String,
             timeout: Duration = Duration.ofSeconds(20)): Unit =
    try {
      get(originUrl,
        HttpServices.BrowseryHeaders :+ ("Referer" -> originUrl),
        timeout, HttpResponse.BodyHandlers.discarding())
      ()
    } catch { case _: Exception => () }
}

/** U8 production impl: GET → stream to disk (64 KiB chunks) with
  * incremental MD5 → sniff the first bytes to correct the advertised
  * Content-Type. Non-2xx is a failure (`ok = false`), so composing
  * with [[RetryingDownloader]] reproduces the reference's
  * status-driven retry, and returning HTML where a document was
  * promised triggers [[TwoPhaseDownloader]]'s interstitial fallback.
  *
  * When `filename` is empty, the name is derived exactly like the
  * reference (_build_target_filename, download_reports.py:389-418):
  * Content-Disposition (RFC 6266/5987 via [[FilenameKernel]]) → URL
  * last segment → `download{ext}` with the extension inferred from
  * Content-Type; the result is sanitized either way.
  */
final class HttpDownloader(
    ctx: HttpContext,
    headers: Seq[(String, String)] = HttpServices.BrowseryHeaders,
    requestTimeout: Duration = Duration.ofSeconds(30),
    parentPage: Option[String] = None) extends Downloader {

  override def download(url: String, destDir: String,
                        filename: String): FileResult = {
    // visible to the catch so a mid-stream failure can remove the
    // truncated file instead of leaving it to be mistaken for a
    // complete download
    var partial: java.nio.file.Path = null
    try {
      val referer = parentPage.getOrElse(HttpServices.origin(url))
      val resp = ctx.get(url, headers :+ ("Referer" -> referer),
        requestTimeout, HttpResponse.BodyHandlers.ofInputStream())
      val status = resp.statusCode()
      if (status < 200 || status >= 300) {
        resp.body().close()
        return FileResult(url, "", 0L, "", "", ok = false, s"HTTP $status")
      }
      val headerCt = resp.headers().firstValue("Content-Type").orElse("")
      val cd = resp.headers().firstValue("Content-Disposition").orElse("")
      val name0 =
        if (filename != null && filename.nonEmpty) filename
        else FilenameKernel.build(url, cd, headerCt, title = "",
          year = 0, quarter = 0)
      val name = name0.replaceAll("[<>:\"/\\\\|?*]", "_")

      Files.createDirectories(Paths.get(destDir))
      val dest = Paths.get(destDir, name)
      partial = dest
      val md = MessageDigest.getInstance("MD5")
      val in = resp.body()
      val out = Files.newOutputStream(dest)
      val head = new Array[Byte](256)
      var headLen = 0
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) {
            if (headLen < head.length) {
              val c = math.min(head.length - headLen, n)
              System.arraycopy(buf, 0, head, headLen, c)
              headLen += c
            }
            md.update(buf, 0, n)
            out.write(buf, 0, n)
          }
          n = in.read(buf)
        }
      } finally {
        // independent closes: a broken connection throwing from
        // in.close() must not leak the file descriptor behind out
        try in.close() finally out.close()
      }
      partial = null // fully written — don't clean up below

      val sniffed = MagicBytes.sniff(head.take(headLen))
      val ct = sniffed.getOrElse(
        if (headerCt.nonEmpty) headerCt.split(";")(0).trim
        else "application/octet-stream")
      val hex = md.digest().map("%02x".format(_)).mkString
      FileResult(url, dest.toString, Files.size(dest), hex, ct,
        ok = true, "")
    } catch {
      case e: Exception =>
        if (partial != null) {
          try Files.deleteIfExists(partial)
          catch { case _: Exception => () }
        }
        FileResult(url, "", 0L, "", "", ok = false,
          String.valueOf(e.getMessage))
    }
  }
}

/** U7 production impl: rendered-HTML stand-in over plain HTTP (no JS —
  * the reference's Selenium rendering stays a non-goal per SURVEY
  * §7.5, and the crawl operators only need the served markup).
  * Reports the post-redirect final URL, which is what the P15
  * redirect-domain guard consumes. Non-2xx and non-HTML payloads map
  * to None, like the reference's get_rendered_content returning None
  * after its retries (enhanced_selenium_scraper.py:208-252) — retry
  * with backoff is built in (max 1 + `retries` attempts).
  */
final class HttpPageFetcher(
    ctx: HttpContext = new HttpContext(),
    requestTimeout: Duration = Duration.ofSeconds(20),
    retries: Int = 2, backoffMillis: Long = 2000,
    sleeper: Long => Unit = Thread.sleep) extends RedirectingPageFetcher {

  override def fetchFinal(url: String): Option[(String, String)] = {
    var attempt = 0
    while (attempt <= retries) {
      try {
        val resp = ctx.get(url,
          HttpServices.BrowseryHeaders :+ ("Referer" -> HttpServices.origin(url)),
          requestTimeout, HttpResponse.BodyHandlers.ofString())
        val status = resp.statusCode()
        if (status >= 200 && status < 300) {
          // a 2xx non-HTML payload (PDF, zip, …) is a definitive
          // "not a page" — the documented None, with no retry
          val ct = resp.headers().firstValue("Content-Type").orElse("")
            .toLowerCase
          if (ct.isEmpty || ct.contains("html") || ct.startsWith("text/"))
            return Some((resp.uri().toString, resp.body()))
          else return None
        }
      } catch { case _: Exception => () }
      attempt += 1
      if (attempt <= retries) sleeper(backoffMillis << (attempt - 1))
    }
    None
  }
}
