package graft.services

import java.nio.file.Files

import graft.SparkTestBase
import graft.expr.DownloadFuncs
import org.apache.spark.sql.functions._

/** Download-stage fidelity vs reference src/download_reports.py:
  * filename chain (349-418), retry/backoff (439-449), magic-byte
  * sniffing (517-530).
  */
class DownloadFidelitySpec extends SparkTestBase {
  import spark.implicits._

  // (url, cd, ct, title, year, quarter) → expected filename, covering
  // every branch of the priority chain.
  val cases = Seq(
    // 1) metadata name wins; ext from URL
    ("https://h.example.com/f/report.pdf", "", "text/html",
      "Acme Q2", 2025, 2, "Acme Q2_2025Q2.pdf"),
    // 1) metadata name; no URL ext → content-type inference
    ("https://h.example.com/f/report", "", "application/pdf",
      "Acme", 2025, 1, "Acme_2025Q1.pdf"),
    // 1) sanitization of dirty title
    ("https://h.example.com/x", "", "text/plain",
      "a<b>:c", 2024, 4, "a_b__c_2024Q4.txt"),
    // 2) Content-Disposition plain filename=
    ("https://h.example.com/dl", "attachment; filename=\"q report.pdf\"",
      "application/octet-stream", "", 0, 0, "q report.pdf"),
    // 2) RFC 5987 filename*= beats plain
    ("https://h.example.com/dl",
      "attachment; filename*=UTF-8'en'enc%20oded.pdf; filename=\"plain.pdf\"",
      "", "", 0, 0, "enc%20oded.pdf"),
    // reference quirk: filename*= with EMPTY language tag does not
    // match either regex → falls through to the URL segment
    ("https://h.example.com/seg.bin", "attachment; filename*=UTF-8''nolang.pdf",
      "", "", 0, 0, "seg.bin"),
    // 3) URL last segment with its own extension
    ("https://h.example.com/a/b/deck.xlsx", "", "", "", 0, 0, "deck.xlsx"),
    // 3) URL last segment without extension → ext appended
    ("https://h.example.com/a/statement", "", "application/zip",
      "", 0, 0, "statement.zip"),
    // 3) trailing slash stripped first
    ("https://h.example.com/a/statement/", "", "text/html",
      "", 0, 0, "statement.html"),
    // 4) empty path → download{ext}
    ("https://h.example.com/", "", "application/msword", "", 0, 0, "download.docx"),
    // 4) unknown content type → .bin
    ("https://h.example.com/", "", "application/whoknows", "", 0, 0, "download.bin"))

  test("FilenameKernel matches the reference chain on every branch") {
    for ((url, cd, ct, title, y, q, want) <- cases)
      assert(FilenameKernel.build(url, cd, ct, title, y, q) == want,
        s"url=$url cd=$cd ct=$ct")
  }

  test("DownloadFuncs column pipeline agrees with FilenameKernel") {
    val df = cases.toDF("url", "cd", "ct", "title", "y", "q", "want")
    val got = df.select(
      $"want",
      DownloadFuncs.buildFilename($"url", $"cd", $"ct", $"title", $"y", $"q")
        .as("col_name")).collect()
    for (r <- got)
      assert(r.getString(1) == r.getString(0), s"column pipeline: $r")
  }

  test("RetryingDownloader retries with exponential backoff then succeeds") {
    var calls = 0
    val flaky = new Downloader {
      override def download(url: String, destDir: String, fn: String): FileResult = {
        calls += 1
        if (calls < 3) FileResult(url, "", 0, "", "", ok = false, "boom")
        else FileResult(url, "/x/" + fn, 1, "d41d8", "application/pdf", ok = true, "")
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val d = new RetryingDownloader(flaky, attempts = 3, backoffMillis = 500,
      sleeper = sleeps += _)
    val res = d.download("https://h.example.com/a.pdf", "/tmp", "a.pdf")
    assert(res.ok && calls == 3)
    assert(sleeps.toSeq == Seq(500L, 1000L)) // backoff_factor-style doubling
  }

  test("RetryingDownloader gives up after `attempts` failures") {
    var calls = 0
    val dead = new Downloader {
      override def download(url: String, destDir: String, fn: String): FileResult = {
        calls += 1; FileResult(url, "", 0, "", "", ok = false, "always down")
      }
    }
    val d = new RetryingDownloader(dead, attempts = 3, backoffMillis = 1,
      sleeper = _ => ())
    val res = d.download("https://h.example.com/a.pdf", "/tmp", "a.pdf")
    assert(!res.ok && calls == 3 && res.error == "always down")
  }

  private def fixed(ok: Boolean, ct: String, onCall: () => Unit = () => ()) =
    new Downloader {
      override def download(url: String, destDir: String, fn: String): FileResult = {
        onCall()
        if (ok) FileResult(url, "/x/" + fn, 1, "cc", ct, ok = true, "")
        else FileResult(url, "", 0, "", "", ok = false, "403")
      }
    }

  test("TwoPhaseDownloader: clean primary success skips warm-up and fallback") {
    var warmed = List.empty[String]
    var fallbackCalls = 0
    val d = new TwoPhaseDownloader(
      fixed(ok = true, "application/pdf"),
      fixed(ok = true, "application/pdf", () => fallbackCalls += 1),
      warmUp = warmed ::= _)
    assert(d.download("https://h.example.com/a/b.pdf", "/t", "b.pdf").ok)
    assert(warmed.isEmpty && fallbackCalls == 0)
  }

  test("TwoPhaseDownloader: failure warms up the origin then retries fallback") {
    var warmed = List.empty[String]
    val d = new TwoPhaseDownloader(
      fixed(ok = false, ""),
      fixed(ok = true, "application/pdf"),
      warmUp = warmed ::= _)
    val res = d.download("https://h.example.com/a/b.pdf", "/t", "b.pdf")
    assert(res.ok && res.contentType == "application/pdf")
    assert(warmed == List("https://h.example.com")) // origin only, no path
  }

  test("TwoPhaseDownloader: HTML payload for a pdf target triggers the fallback") {
    val d = new TwoPhaseDownloader(
      fixed(ok = true, "text/html"), // interstitial page, not the document
      fixed(ok = true, "application/pdf"))
    val res = d.download("https://h.example.com/q.pdf", "/t", "q.pdf")
    assert(res.contentType == "application/pdf")
    // ...but an html target legitimately returns text/html — no retry
    var fallbackCalls = 0
    val d2 = new TwoPhaseDownloader(
      fixed(ok = true, "text/html"),
      fixed(ok = true, "text/html", () => fallbackCalls += 1))
    assert(d2.download("https://h.example.com/page.html", "/t", "page.html").ok)
    assert(fallbackCalls == 0)
  }

  test("TwoPhaseDownloader: suspicious primary kept when fallback also fails") {
    val d = new TwoPhaseDownloader(
      fixed(ok = true, "text/html"),
      fixed(ok = false, ""))
    val res = d.download("https://h.example.com/q.pdf", "/t", "q.pdf")
    assert(res.ok && res.contentType == "text/html")
  }

  test("MagicBytes sniffs pdf/zip/gzip/html and rejects noise") {
    assert(MagicBytes.sniff("%PDF-1.7 blah".getBytes).contains("application/pdf"))
    assert(MagicBytes.sniff(Array[Byte](0x50, 0x4b, 0x03, 0x04, 9, 9))
      .contains("application/zip"))
    assert(MagicBytes.sniff(Array[Byte](0x1f, 0x8b.toByte, 1))
      .contains("application/gzip"))
    assert(MagicBytes.sniff("  <!DOCTYPE html><html>".getBytes)
      .contains("text/html"))
    assert(MagicBytes.sniff("<html lang=\"en\">".getBytes).contains("text/html"))
    assert(MagicBytes.sniff("just some text".getBytes).isEmpty)
    assert(MagicBytes.sniff(Array.emptyByteArray).isEmpty)
  }

  test("LocalFileDownloader reports sniffed content type over extension guess") {
    val work = Files.createTempDirectory("graft-sniff")
    val f = work.resolve("mislabeled.html") // extension says html...
    Files.write(f, "%PDF-1.4 fake pdf body".getBytes) // ...bytes say pdf
    val res = new LocalFileDownloader()
      .download(s"file:$f", work.resolve("d").toString, "mislabeled.html")
    assert(res.ok)
    assert(res.contentType == "application/pdf")
  }
}
