package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import Pdf.PdfCodec

class PdfSpec extends SparkTestBase {
  import spark.implicits._

  test("encode/extract round-trips plain multi-line text") {
    for (n <- 1 to 5) {
      val lines = (0 until n).map(i => s"line $i with words and 12$i numbers")
      val got = PdfCodec.extractText(PdfCodec.encodePdf(lines))
      assert(got.contains(lines.mkString("\n")), s"n=$n got=$got")
    }
  }

  test("literal-string escapes round-trip: parens, backslash, control") {
    val lines = Seq(
      "parens (nested (deep)) and \\ backslash",
      "tab\there newline-free",
      "trailing (unbalanced-looking close) ok")
    val got = PdfCodec.extractText(PdfCodec.encodePdf(lines))
    assert(got.contains(lines.mkString("\n")), s"got=$got")
  }

  test("TJ arrays with kern numbers and hex strings extract cleanly") {
    // odd lines go through the TJ-array + hex-string path by
    // construction; make every variant-length split land there
    val lines = Seq("even tj line", "odd tj-array line with hex half",
      "even again", "x")
    val got = PdfCodec.extractText(PdfCodec.encodePdf(lines))
    assert(got.contains(lines.mkString("\n")))
  }

  test("multi-page PDFs: per-page content streams extract in document order") {
    val pages = Seq(
      Seq("page one line a", "page one line b"),
      Seq("page two only line"),
      Seq("page three first", "page three second"))
    val got = PdfCodec.extractText(PdfCodec.encodePdfPages(pages))
    assert(got.contains(pages.flatten.mkString("\n")), s"got=$got")
    val raw = PdfCodec.extractText(PdfCodec.encodePdfPages(pages,
      compress = false))
    assert(raw == got)
  }

  test("uncompressed content streams (no /FlateDecode) extract too") {
    val lines = Seq("raw stream body", "second line")
    val got = PdfCodec.extractText(PdfCodec.encodePdf(lines, compress = false))
    assert(got.contains(lines.mkString("\n")))
  }

  test("octal escapes and hex oddities decode per spec") {
    // hand-built content stream exercising \101 (= 'A'), a hex string
    // with whitespace and an odd trailing digit (padded with 0), and
    // a comment that must not swallow text
    val content = "BT /F1 12 Tf 72 720 Td (\\101BC) Tj " +
      "0 -14 Td <4 84 9> Tj % comment (not text)\n" +
      "0 -14 Td (after) Tj ET"
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF\n")
      .getBytes(latin1)
    val got = PdfCodec.extractText(pdf)
    // <4 84 9> = digit stream 4,8,4,9 -> byte pairs 0x48 0x49 = "HI"
    assert(got.contains("ABC\nHI\nafter"), s"got=$got")
  }

  test("stray delimiters in content streams terminate (no hang) and " +
    "surrounding text survives") {
    // PostScript braces (Type-4 functions), an unmatched ')', a stray
    // '>': none may stall the tokenizer — a hang is the one failure
    // mode the per-row NonFatal catch cannot rescue
    val content = "BT /F1 12 Tf 72 720 Td (before) Tj " +
      "{ 2 mul } ) > 0 -14 Td (after) Tj ET"
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF\n")
      .getBytes(latin1)
    val got = PdfCodec.extractText(pdf)
    assert(got.contains("before\nafter"), s"got=$got")
  }

  test("corrupt, truncated, and non-PDF payloads extract to None") {
    val pdf = PdfCodec.encodePdf(Seq("some text"))
    assert(PdfCodec.extractText(null).isEmpty)
    assert(PdfCodec.extractText(Array.emptyByteArray).isEmpty)
    assert(PdfCodec.extractText("plain text file".getBytes).isEmpty)
    assert(PdfCodec.extractText(java.util.Arrays.copyOf(pdf, 8)).isEmpty)
    assert(PdfCodec.extractText(java.util.Arrays.copyOf(pdf, 60)).isEmpty)
    // flipped bytes inside the deflate payload: inflate fails -> None,
    // never a throw
    val broken = pdf.clone()
    val k = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("stream\n") + 10
    broken(k) = (broken(k) ^ 0x5a).toByte
    broken(k + 1) = (broken(k + 1) ^ 0x5a).toByte
    assert(PdfCodec.extractText(broken).isEmpty ||
      PdfCodec.extractText(broken) != PdfCodec.extractText(pdf))
  }

  test("distributed extraction: planted pdfs recover closed-form text, " +
    "corrupt rows null") {
    val docs = spark.range(0, 120).select($"id".as("doc_id"))
    val assets = Pdf.plantedPdfs(spark, docs)
    val out = Pdf.extractPdfText(spark, assets).collect()
    assert(out.length == 120)
    out.foreach { r =>
      if (r.asset_id % 37 == 0) {
        assert(r.text.isEmpty && r.n_chars.isEmpty, s"id=${r.asset_id}")
      } else {
        val id = r.asset_id
        val want = s"report $id earnings (net) summary\n" +
          s"revenue ${id * 31 + 1} usd\n" +
          s"total ${id * 7} qtr ${id % 4}"
        assert(r.text.contains(want), s"id=$id got=${r.text}")
        assert(r.n_chars.contains(want.length.toLong))
      }
    }
  }

  test("real corpus text round-trips byte-exact through encode/extract") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"text".isNotNull).limit(120)
    val src = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    val out = Pdf.extractPdfText(spark, Pdf.encodeCorpusPdfs(spark, docs))
      .collect()
    assert(out.length == src.size)
    out.foreach { r =>
      assert(r.text.contains(src(r.asset_id)),
        s"doc ${r.asset_id}: extraction diverged")
    }
  }

  test("non-Latin-1 text round-trips via the FEFF UTF-16BE hex path") {
    // chars the ISO-8859-1 byte path would fold to '?': Greek, CJK,
    // combining marks, and an astral emoji (surrogate pair)
    val lines = Seq(
      "ascii line stays on the literal path",
      "\u03B1\u03B2\u03B3 \u4E2D\u6587 r\u00E9sum\u00E9",
      "combining: e\u0301 astral: \uD83D\uDE00 end")
    val got = PdfCodec.extractText(PdfCodec.encodePdf(lines))
    assert(got.contains(lines.mkString("\n")))
    // mixed Latin-1 (<= U+00FF) lines keep the byte path — byte-identical
    // to the pre-UTF-16 encoder for every md5-pinned fixture
    val latin = Seq("caf\u00E9 \u00FF ok", "plain")
    assert(PdfCodec.extractText(PdfCodec.encodePdf(latin))
      .contains(latin.mkString("\n")))
    // Latin-1 lines BEGINNING with U+00FE U+00FF would emit literal
    // bytes indistinguishable from the UTF-16 BOM — the encoder must
    // route them through the hex path so they still round-trip, both
    // as a whole line and as the hex half of a TJ split (odd index)
    val bomish = Seq(
      "\u00FE\u00FFab starts with the BOM pair",
      "aaaa\u00FE\u00FFbb", // len 8, split 4: b = "\u00FE\u00FFbb"
      "plain",
      "ab\u00FE\u00FFcd") // split 3 -> b = "\u00FFcd": FF alone, safe
    val gotBom = PdfCodec.extractText(PdfCodec.encodePdf(bomish))
    assert(gotBom.contains(bomish.mkString("\n")), s"got=$gotBom")
    // corpus-level round trip with Unicode injected
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"text".isNotNull).limit(24)
      .select($"doc_id",
        concat(lit("\u00DCml\u00E4ut \u2192 \u4ECA "), $"text").as("text"))
    val src = docs.as[(Long, String)].collect().toMap
    Pdf.extractPdfText(spark, Pdf.encodeCorpusPdfs(spark, docs))
      .collect().foreach { r =>
        assert(r.text.contains(src(r.asset_id)),
          s"doc ${r.asset_id}: unicode extraction diverged")
      }
  }

  test("planted fixtures are valid PDFs for the structure they declare") {
    // xref offsets must point at the objects they index — byte-exact
    val pdf = PdfCodec.encodePdf(Seq("check xref"))
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xrefAt = s.indexOf("xref\n0 6\n")
    assert(xrefAt > 0)
    val entries = s.substring(xrefAt).linesIterator.drop(3).take(5).toSeq
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      assert(s.startsWith(s"${i + 1} 0 obj", off),
        s"xref entry ${i + 1} points at '${s.substring(off, off + 12)}'")
    }
    assert(s.substring(s.indexOf("startxref")).contains(xrefAt.toString))
  }

  test("embedded image: exact pixel round-trip, text coexists, " +
      "unsupported and truncated payloads degrade to zero images") {
    val P = Pdf.PdfCodec
    val bytes = P.encodePdfWithImage(Seq("caption line"), 5, 3,
      (x, y) => 10 * y + x)
    val imgs = P.extractImages(bytes)
    assert(imgs.length == 1)
    val im = imgs.head
    assert(im.width == 5 && im.height == 3)
    // row-major exact bytes
    assert(im.gray.map(_ & 0xff).toSeq ==
      (0 until 3).flatMap(y => (0 until 5).map(x => 10 * y + x)))
    // the text channel is unaffected by the image object
    assert(P.extractText(bytes).contains("caption line"))
    // a text-only PDF has no images
    assert(P.extractImages(P.encodePdf(Seq("just text"))).isEmpty)
    // truncation and junk yield zero images, never a throw
    assert(P.extractImages(bytes.take(60)).isEmpty)
    assert(P.extractImages("junk".getBytes).isEmpty)
    assert(P.extractImages(null).isEmpty)
    // 255-clamped samples survive (byte sign handling)
    val bright = P.extractImages(
      P.encodePdfWithImage(Seq("x"), 2, 1, (_, _) => 255)).head
    assert(bright.gray.map(_ & 0xff).toSeq == Seq(255, 255))
  }

  test("distributed image stats: planted gradients recover exactly, " +
      "truncated assets contribute no rows") {
    import spark.implicits._
    val assets = spark.createDataset((1L to 20L).map { id =>
      val full = Pdf.PdfCodec.encodePdfWithImage(
        Seq(s"doc $id"), 4, 2, (x, y) => ((id + x + 2 * y) % 7).toInt)
      val content = if (id % 5 == 0) full.take(50) else full
      graft.llmops.Multimodal.Asset(id, "document", content,
        None, None, None, Some("pdf"))
    })
    val got = Pdf.extractPdfImages(spark, assets).collect()
      .map(s => s.asset_id -> s).toMap
    assert(got.keySet == (1L to 20L).filterNot(_ % 5 == 0).toSet)
    got.values.foreach { s =>
      assert(s.width == 4 && s.height == 2 && s.n_pixels == 8L)
      val expect = (for { y <- 0 until 2; x <- 0 until 4 }
        yield (s.asset_id + x + 2 * y) % 7).sum
      assert(s.sum_gray == expect, s"asset ${s.asset_id}")
    }
  }
}
