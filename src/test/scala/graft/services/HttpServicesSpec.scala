package graft.services

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Production U7/U8 impls against a local in-process HTTP server —
  * hermetic (127.0.0.1, ephemeral port, no egress), but exercising the
  * real java.net.http stack end to end: redirects, cookies, headers,
  * streamed bodies. Reference behaviors pinned: retry schedule
  * (download_reports.py:439-449), warm-up + Referer fallback
  * (:496-513), streamed chunks + MD5 (:536-545), magic-byte sniff
  * (:517-530), Content-Disposition naming (:389-418).
  */
class HttpServicesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val pdfBytes =
    ("%PDF-1.7\n" + "x" * 200000).getBytes("US-ASCII") // > one 64 KiB chunk
  private val flakyHits = new AtomicInteger(0)
  @volatile private var lastDocReferer: String = ""

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte],
                      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"

    server.createContext("/doc.pdf", (ex: HttpExchange) => {
      lastDocReferer =
        Option(ex.getRequestHeaders.getFirst("Referer")).getOrElse("")
      respond(ex, 200, pdfBytes, "Content-Type" -> "application/pdf")
    })
    // header lies; the body is a PDF
    server.createContext("/lying", (ex: HttpExchange) =>
      respond(ex, 200, pdfBytes, "Content-Type" -> "text/plain"))
    server.createContext("/cd", (ex: HttpExchange) =>
      respond(ex, 200, pdfBytes,
        "Content-Type" -> "application/octet-stream",
        "Content-Disposition" -> "attachment; filename=\"q report.pdf\""))
    server.createContext("/redirect", (ex: HttpExchange) =>
      respond(ex, 302, Array.emptyByteArray,
        "Location" -> s"$base/doc.pdf"))
    server.createContext("/redirect-page", (ex: HttpExchange) =>
      respond(ex, 302, Array.emptyByteArray,
        "Location" -> s"$base/page"))
    // promises more bytes than it sends — a mid-stream connection drop
    server.createContext("/truncated", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Content-Type", "application/pdf")
      ex.sendResponseHeaders(200, 100000)
      ex.getResponseBody.write("%PDF-1.7 short".getBytes("US-ASCII"))
      ex.close()
    })
    server.createContext("/page", (ex: HttpExchange) =>
      respond(ex, 200, "<html><body><a href='/doc.pdf'>r</a></body></html>"
        .getBytes("UTF-8"), "Content-Type" -> "text/html"))
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "gone".getBytes("UTF-8")))
    // 503 twice, then 200 — the RetryingDownloader schedule probe
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyHits.incrementAndGet() <= 2)
        respond(ex, 503, "busy".getBytes("UTF-8"))
      else respond(ex, 200, pdfBytes, "Content-Type" -> "application/pdf")
    })
    // anti-bot gate: origin warm-up sets a cookie; the document is an
    // HTML interstitial until the cookie comes back
    server.createContext("/", (ex: HttpExchange) => {
      if (ex.getRequestURI.getPath == "/")
        respond(ex, 200, "<html>welcome</html>".getBytes("UTF-8"),
          "Content-Type" -> "text/html",
          "Set-Cookie" -> "warm=1; Path=/")
      else respond(ex, 404, Array.emptyByteArray)
    })
    server.createContext("/gated.pdf", (ex: HttpExchange) => {
      val warmed = Option(ex.getRequestHeaders.getFirst("Cookie"))
        .exists(_.contains("warm=1"))
      if (warmed) respond(ex, 200, pdfBytes,
        "Content-Type" -> "application/pdf")
      else respond(ex, 200,
        "<!doctype html><html>prove you are human</html>".getBytes("UTF-8"),
        "Content-Type" -> "text/html")
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def tmpDir(): Path = Files.createTempDirectory("httpdl")
  private def md5Of(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  test("downloads stream to disk with exact bytes and incremental MD5") {
    val dl = new HttpDownloader(new HttpContext())
    val dir = tmpDir()
    val r = dl.download(s"$base/doc.pdf", dir.toString, "r.pdf")
    assert(r.ok, r.error)
    assert(r.size == pdfBytes.length)
    assert(r.checksum == md5Of(pdfBytes))
    assert(Files.readAllBytes(Path.of(r.path)).sameElements(pdfBytes))
    assert(r.contentType == "application/pdf")
    // Referer carried on the request, derived from the origin
    assert(lastDocReferer == base)
  }

  test("magic-byte sniff overrides a lying Content-Type header") {
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/lying", tmpDir().toString, "f.bin")
    assert(r.ok && r.contentType == "application/pdf")
  }

  test("empty filename derives from Content-Disposition, sanitized") {
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/cd", tmpDir().toString, "")
    assert(r.ok)
    assert(r.path.endsWith("q report.pdf"))
  }

  test("empty filename without CD falls back to the URL segment") {
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/doc.pdf", tmpDir().toString, "")
    assert(r.ok && r.path.endsWith("doc.pdf"))
  }

  test("redirects are followed transparently") {
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/redirect", tmpDir().toString, "via.pdf")
    assert(r.ok && r.size == pdfBytes.length)
  }

  test("non-2xx is a failure result, not an exception") {
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/missing", tmpDir().toString, "x.pdf")
    assert(!r.ok && r.error == "HTTP 404")
  }

  test("retry decorator replays the reference schedule on 5xx") {
    flakyHits.set(0)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val dl = new RetryingDownloader(new HttpDownloader(new HttpContext()),
      attempts = 3, backoffMillis = 500, sleeper = sleeps += _)
    val r = dl.download(s"$base/flaky", tmpDir().toString, "f.pdf")
    assert(r.ok && r.size == pdfBytes.length)
    assert(sleeps.toSeq == Seq(500L, 1000L)) // 0.5 s, 1 s — total=3
  }

  test("two-phase fallback acquires origin cookies via warm-up") {
    val ctx = new HttpContext()
    val dl = new TwoPhaseDownloader(
      primary = new HttpDownloader(ctx, HttpServices.BrowseryHeaders),
      fallback = new HttpDownloader(ctx, HttpServices.AltAcceptHeaders),
      warmUp = ctx.warmUp(_))
    val r = dl.download(s"$base/gated.pdf", tmpDir().toString, "gated.pdf")
    assert(r.ok, r.error)
    // the interstitial HTML was replaced by the real document
    assert(r.contentType == "application/pdf")
    assert(r.size == pdfBytes.length)
  }

  test("robustDownloader factory survives serialization (executor shape)") {
    val dl = HttpServices.robustDownloader(sleeper = _ => ())
    val bytes = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bytes)
    oos.writeObject(dl); oos.close()
    val back = new ObjectInputStream(
      new ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[Downloader]
    val r = back.download(s"$base/doc.pdf", tmpDir().toString, "s.pdf")
    assert(r.ok && r.checksum == md5Of(pdfBytes))
  }

  test("page fetcher returns body and post-redirect final URL") {
    val pf = new HttpPageFetcher(sleeper = _ => ())
    assert(pf.fetch(s"$base/page").exists(_.contains("doc.pdf")))
    val viaRedirect = pf.fetchFinal(s"$base/redirect-page")
    assert(viaRedirect.exists(_._1 == s"$base/page"))
  }

  test("page fetcher maps 2xx non-HTML payloads to None, no retries") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pf = new HttpPageFetcher(retries = 2, sleeper = sleeps += _)
    assert(pf.fetchFinal(s"$base/doc.pdf").isEmpty) // application/pdf
    assert(sleeps.isEmpty, "a definitive non-page must not retry")
  }

  test("mid-stream failure reports not-ok and leaves no partial file") {
    val dir = tmpDir()
    val r = new HttpDownloader(new HttpContext())
      .download(s"$base/truncated", dir.toString, "t.pdf")
    assert(!r.ok)
    assert(!Files.exists(dir.resolve("t.pdf")),
      "truncated download must be cleaned up")
  }

  test("null filename is accepted through the full robust composition") {
    val dir = tmpDir()
    val r = HttpServices.robustDownloader(sleeper = _ => ())
      .download(s"$base/doc.pdf", dir.toString, null)
    assert(r.ok && r.checksum == md5Of(pdfBytes))
    assert(Files.exists(Path.of(r.path)))
  }

  test("page fetcher retries with backoff then yields None") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pf = new HttpPageFetcher(retries = 2, backoffMillis = 2000,
      sleeper = sleeps += _)
    assert(pf.fetch(s"$base/missing").isEmpty)
    assert(sleeps.toSeq == Seq(2000L, 4000L))
  }
}
