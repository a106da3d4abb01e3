package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def mkFile(gzip: Boolean): (Array[Byte], Seq[String]) = {
    val bodies = Seq("<html>alpha</html>", "<html>beta two</html>",
      "plain text payload")
    val recs = Warc.encodeWarcinfo("f.warc", "2026-01-01T00:00:00Z") +:
      bodies.zipWithIndex.map { case (b, i) =>
        Warc.encodeResponse(s"https://ex.example.com/p$i",
          "2026-01-01T00:00:00Z", b.getBytes(latin1),
          status = if (i == 2) 404 else 200,
          httpContentType = if (i == 2) "text/plain" else "text/html")
      }
    (Warc.encodeFile(recs, gzip), bodies)
  }

  test("records round-trip: types, uris, status, and exact bodies") {
    for (gz <- Seq(false, true)) {
      val (bytes, bodies) = mkFile(gz)
      val recs = Warc.parseRecords(bytes)
      assert(recs.length == 4, s"gz=$gz got ${recs.length}")
      assert(recs.head.warc_type == "warcinfo" &&
        recs.head.http_status.isEmpty)
      val resp = recs.tail
      assert(resp.map(_.warc_type).forall(_ == "response"))
      assert(resp.map(_.target_uri.get) ==
        Seq(0, 1, 2).map(i => s"https://ex.example.com/p$i"))
      assert(resp.map(_.http_status.get) == Seq(200, 200, 404))
      assert(resp.map(r => new String(r.content, latin1)) == bodies)
      assert(resp(2).http_content_type.contains("text/plain"))
    }
  }

  test("truncated tails keep parsed records; junk parses to empty") {
    val (bytes, _) = mkFile(gzip = false)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 40)
    val recs = Warc.parseRecords(cut)
    assert(recs.length == 3, s"got ${recs.length}") // last record lost
    assert(Warc.parseRecords(Array[Byte](1, 2, 3)).isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
    assert(Warc.parseRecords("WARC/1.0\r\nbroken".getBytes(latin1)).isEmpty)
    // gzip truncation degrades like plain truncation: members inflated
    // before the cut survive
    val (gz, _) = mkFile(gzip = true)
    val gzCut = java.util.Arrays.copyOf(gz, gz.length - 30)
    val gzRecs = Warc.parseRecords(gzCut)
    assert(gzRecs.length == 3, s"got ${gzRecs.length}")
    assert(gzRecs.last.target_uri.contains("https://ex.example.com/p1"))
  }

  test("archive replay: the BFS crawl walks a WARC site snapshot " +
    "exactly like a live crawl") {
    // the CrawlSpec site, captured to .warc.gz and replayed
    val base = "https://ir.corp.com"
    val site = Map(
      s"$base/index.html" ->
        """<html><body><a href="/docs/annual-report-2024.pdf">Annual</a>
          |<a href="/quarterly-earnings">Quarterly earnings</a></body></html>"""
          .stripMargin,
      s"$base/quarterly-earnings" ->
        """<html><body><a href="/docs/q2-2025-earnings.pdf">Q2</a></body></html>""")
    val recs = Warc.encodeWarcinfo("site.warc", "2026-01-01T00:00:00Z") +:
      site.toSeq.map { case (u, html) =>
        Warc.encodeResponse(u, "2026-01-01T00:00:00Z", html.getBytes(latin1))
      }
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-site")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.write(dir.resolve("site.warc.gz"),
      Warc.encodeFile(recs, gzip = true))
    val pages = Warc.pageMap(spark, dir.toString)
    assert(pages.keySet == site.keySet)
    val links = graft.pipeline.Crawl.crawl(spark,
      Seq(("corp", s"$base/index.html")).toDF("company", "url"),
      graft.services.MapPageFetcher(pages), maxDepth = 2, topK = 5)
    val docs = links.filter($"link_type" === "document")
      .select($"href").as[String].collect().toSet
    assert(docs == Set(s"$base/docs/annual-report-2024.pdf",
      s"$base/docs/q2-2025-earnings.pdf"))
  }

  test("readFiles: file-parallel source over plain and gzip files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    dir.toFile.deleteOnExit()
    val (plain, _) = mkFile(gzip = false)
    val (gz, _) = mkFile(gzip = true)
    java.nio.file.Files.write(dir.resolve("a.warc"), plain)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz)
    val df = Warc.readFiles(spark, dir.toString + "/*").cache()
    assert(df.count() == 8)
    assert(df.filter($"warc_type" === "response").count() == 6)
    // bodies land exactly, per file
    val byFile = df.filter($"http_status" === 200)
      .groupBy($"file").agg(count(lit(1)).as("n")).collect()
    assert(byFile.length == 2 && byFile.forall(_.getLong(1) == 2L))
    // the payload feeds the html tier directly
    val links = df.filter($"http_content_type" === "text/html")
      .select(graft.html.HtmlFuncs.clean_html(
        $"content".cast("string")).as("t"))
      .collect()
    assert(links.length == 4)
  }

  test("indexed parse: every (offset, length) slice re-parses to its " +
      "record, plain and gzip") {
    for (gz <- Seq(false, true)) {
      val (bytes, _) = mkFile(gz)
      val idx = Warc.parseRecordsIndexed(bytes)
      assert(idx.length == 4, s"gz=$gz got ${idx.length}")
      // same records in the same order as the plain parse
      val plain = Warc.parseRecords(bytes)
      assert(idx.map(_._1.target_uri) == plain.map(_.target_uri))
      for ((rec, off, len) <- idx) {
        val slice = java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt)
        val reparsed = Warc.parseRecords(slice)
        assert(reparsed.length == 1, s"gz=$gz off=$off")
        assert(reparsed.head.target_uri == rec.target_uri)
        assert(java.util.Arrays.equals(reparsed.head.content, rec.content))
      }
      // offsets are disjoint ascending spans
      assert(idx.map(_._2) == idx.map(_._2).sorted)
      idx.sliding(2).foreach {
        case Seq((_, o1, l1), (_, o2, _)) => assert(o1 + l1 <= o2)
        case _ =>
      }
    }
  }

  test("gzip member walker: bounds cover the file; truncation keeps " +
      "prior members") {
    val (gz, _) = mkFile(gzip = true)
    val bounds = Warc.gzipMemberBounds(gz)
    assert(bounds.length == 4)
    assert(bounds.head._1 == 0L)
    assert(bounds.map(b => b._1 + b._2).max == gz.length.toLong)
    // cut inside the last member: the first three survive
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length - 10)
    assert(Warc.gzipMemberBounds(cut).length == 3)
    assert(Warc.gzipMemberBounds(Array[Byte](0x1f, 0x8b.toByte)).isEmpty)
  }

  test("cdx index + point reads reproduce every payload without a scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx")
    dir.toFile.deleteOnExit()
    val (plain, _) = mkFile(gzip = false)
    val (gz, _) = mkFile(gzip = true)
    java.nio.file.Files.write(dir.resolve("a.warc"), plain)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz)

    val idx = Warc.cdxIndex(spark, dir.toString + "/*").cache()
    assert(idx.count() == 8)
    assert(idx.columns.toSeq == Seq("uri", "file", "offset", "length",
      "warc_type", "http_status", "n_bytes", "http_content_type"))

    // single point read straight from an index row
    val row = idx.filter($"uri" === "https://ex.example.com/p1" &&
      $"file".endsWith("b.warc.gz")).head
    val recs = Warc.readRecordAt(row.getString(1), row.getLong(2),
      row.getLong(3))
    assert(recs.length == 1 &&
      new String(recs.head.content, latin1) == "<html>beta two</html>")

    // distributed fetch of all responses: bodies byte-identical to the
    // full-scan source
    val hits = idx.filter($"warc_type" === "response")
    val fetched = Warc.fetchRecords(spark, hits)
      .select($"target_uri", md5($"content").as("h"))
    val scanned = Warc.readFiles(spark, dir.toString + "/*")
      .filter($"warc_type" === "response")
      .select($"target_uri", md5($"content").as("h"))
    assert(fetched.except(scanned).count() == 0 &&
      scanned.except(fetched).count() == 0 && fetched.count() == 6)
  }
}
