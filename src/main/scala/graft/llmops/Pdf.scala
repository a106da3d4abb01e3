package graft.llmops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.Asset

/** JDK-only PDF text extraction — the document modality of the
  * multimodal tier, and the reference's ACTUAL payload type: its
  * pipeline downloads PDF earnings reports and runs a parsing stage
  * over them (reference `README.md:80-82`, `:149-162` — the Docling
  * parse step; `download_reports.py` fetches the PDFs themselves).
  * Same architecture as the image ([[Multimodal.ImageCodec]]) and
  * audio ([[Audio.WavCodec]]) codecs: a from-scratch encoder for
  * planted fixtures whose text a SQL oracle predicts in closed form
  * without parsing a byte, and a from-scratch extractor that runs
  * `mapPartitions`-distributed with payloads never on the driver.
  *
  * The extractor implements the minimal viable subset of ISO 32000
  * (PDF 1.x, public spec) that text extraction needs:
  *
  *  - content streams located by a linear `stream`…`endstream` scan
  *    (deliberately NOT via the xref table: a byte-offset index is an
  *    optimization for random access, and real-world crawled PDFs
  *    routinely have broken xrefs — the linear scan extracts from
  *    exactly the documents a crawler actually encounters);
  *  - `/FlateDecode` streams inflated with `java.util.zip.Inflater`
  *    (the overwhelmingly dominant filter; others are skipped, never
  *    a task failure);
  *  - text collected from the `Tj`, `'`, `"`, and `TJ` show operators
  *    inside BT…ET blocks, with literal-string escapes (`\(`, `\)`,
  *    `\\`, `\n`, `\r`, `\t`, `\b`, `\f`, octal `\ddd`, and
  *    backslash line continuation), balanced nested parentheses, and
  *    `<…>` hex strings — the full string syntax of §7.3.4;
  *  - a text-positioning operator (`Td`, `TD`, `T*`, or the implicit
  *    moves of `'`/`"`) between two shows emits one `\n` — the
  *    layout-free line semantics every practical extractor converges
  *    on.
  *
  * Corrupt, truncated, encrypted, or non-PDF payloads extract to
  * `None` — the q108/q114 contract: nulls, never task failures.
  */
object Pdf {

  object PdfCodec {

    // ---------------------------------------------------------- encode

    /** Escape a literal string for a PDF `(…)` string (§7.3.4.2). */
    private def esc(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      }

    private def hexStr(s: String): String =
      s.map(c => f"${c.toInt}%02X").mkString

    /** UTF-16BE hex string with the §7.9.2.2 BOM — the PDF text-string
      * convention for anything beyond Latin-1.
      */
    private def utf16Hex(s: String): String =
      "FEFF" + s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        .map(b => f"${b & 0xff}%02X").mkString

    /** Build the page content stream: one `Td` move then one show op
      * per line — even lines as literal-string `Tj`, odd lines as a
      * `TJ` array split into a literal part, a kern number (which
      * extraction must ignore), and a hex-string part, so every
      * multi-line document exercises both show operators and both
      * string syntaxes. Lines with any char above U+00FF can't ride
      * the Latin-1 byte path — they emit as ONE `<FEFF…>` UTF-16BE hex
      * string (the §7.9.2.2 text-string convention), which the
      * extractor's BOM check decodes back exactly; pure-Latin-1 input
      * produces byte-identical output to the pre-UTF-16 encoder, so
      * every md5-pinned ASCII fixture is untouched.
      */
    private def contentStream(lines: Seq[String]): String = {
      val ops = lines.zipWithIndex.map { case (line, i) =>
        // A Latin-1 string that BEGINS with U+00FE U+00FF would emit
        // the bytes FE FF \u2014 indistinguishable from the \u00A77.9.2.2 BOM,
        // so the extractor would (correctly, per spec) misread it as
        // UTF-16BE. A conforming writer must not emit that prefix as
        // a byte string; route any such line (whole, or the hex half
        // of a TJ split) through the unambiguous UTF-16 path too.
        val (a, b) = line.splitAt(line.length / 2)
        val bomAmbiguous = line.startsWith("\u00FE\u00FF") ||
          (i % 2 == 1 && b.startsWith("\u00FE\u00FF"))
        val show =
          if (line.exists(_ > '\u00FF') || bomAmbiguous)
            s"<${utf16Hex(line)}> Tj"
          else if (i % 2 == 0) s"(${esc(line)}) Tj"
          else s"[(${esc(a)}) -250 <${hexStr(b)}>] TJ"
        val move = if (i == 0) "72 720 Td" else "0 -14 Td"
        s"$move\n$show"
      }
      s"BT\n/F1 12 Tf\n${ops.mkString("\n")}\nET\n"
    }

    private def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }

    /** Encode a complete single-page PDF showing `lines` — see
      * [[encodePdfPages]] (this is its one-page form).
      */
    def encodePdf(lines: Seq[String], compress: Boolean = true): Array[Byte] =
      encodePdfPages(Seq(lines), compress)

    /** Encode a complete multi-page PDF, one content stream per page —
      * catalog, page tree, shared Helvetica font, Flate-compressed
      * content streams (raw when `compress = false`, exercising the
      * unfiltered path), and a byte-exact xref table + trailer, so the
      * fixture is a fully valid document for ANY reader, not just
      * ours. Object layout: 1 catalog, 2 page tree, 3 font, then per
      * page i: page object (4 + 2i) and content stream (5 + 2i).
      */
    def encodePdfPages(pages: Seq[Seq[String]],
                       compress: Boolean = true,
                       image: Option[(Int, Int, (Int, Int) => Int)] = None)
        : Array[Byte] = {
      require(pages.nonEmpty, "at least one page")
      image.foreach { case (iw, ih, _) =>
        require(iw > 0 && ih > 0, "image dims must be positive") }
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val n = pages.length
      // image XObject (when present) is the LAST object, so the text
      // layout — and every byte the image-free fixtures pin — is
      // identical with image = None
      val nObj = 3 + 2 * n + (if (image.isDefined) 1 else 0)
      val imageId = 3 + 2 * n + 1
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(latin1))
      val offsets = new Array[Int](nObj + 1)
      w("%PDF-1.4\n")
      offsets(1) = out.size()
      w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      offsets(2) = out.size()
      val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
      w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
      offsets(3) = out.size()
      w("3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
      pages.zipWithIndex.foreach { case (lines, i) =>
        val pageId = 4 + 2 * i
        val contentId = 5 + 2 * i
        val withImage = image.isDefined && i == 0
        offsets(pageId) = out.size()
        val xobj =
          if (withImage) s"/XObject << /Im1 $imageId 0 R >> " else ""
        w(s"$pageId 0 obj << /Type /Page /Parent 2 0 R " +
          "/MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> $xobj>> " +
          s"/Contents $contentId 0 R >> endobj\n")
        val body = contentStream(lines) +
          (if (withImage) "q 100 0 0 100 50 50 cm /Im1 Do Q\n" else "")
        val content = body.getBytes(latin1)
        val payload = if (compress) deflate(content) else content
        val filter = if (compress) " /Filter /FlateDecode" else ""
        offsets(contentId) = out.size()
        w(s"$contentId 0 obj << /Length ${payload.length}$filter >> stream\n")
        out.write(payload)
        w("\nendstream endobj\n")
      }
      image.foreach { case (iw, ih, gray) =>
        val pixels = new Array[Byte](iw * ih)
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            pixels(y * iw + x) = (gray(x, y) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        val iPayload = deflate(pixels)
        offsets(imageId) = out.size()
        w(s"$imageId 0 obj << /Type /XObject /Subtype /Image /Width $iw " +
          s"/Height $ih /ColorSpace /DeviceGray /BitsPerComponent 8 " +
          s"/Filter /FlateDecode /Length ${iPayload.length} >> stream\n")
        out.write(iPayload)
        w("\nendstream endobj\n")
      }
      val xref = out.size()
      w(s"xref\n0 ${nObj + 1}\n0000000000 65535 f \n")
      (1 to nObj).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
      w(s"trailer << /Size ${nObj + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
      out.toByteArray
    }

    /** Encode a single-page PDF carrying `lines` of text AND one
      * embedded grayscale image XObject — 8-bit /DeviceGray raw
      * samples under /FlateDecode, so the pixel payload is LOSSLESS
      * and closed-form predictable (the q108 planted-fixture
      * discipline; DCT/JPEG would be lossy). `gray(x, y)` supplies
      * row-major samples. One framing writer: this is
      * [[encodePdfPages]] with its optional image object.
      */
    def encodePdfWithImage(lines: Seq[String], imgW: Int, imgH: Int,
                           gray: (Int, Int) => Int): Array[Byte] =
      encodePdfPages(Seq(lines), compress = true,
        image = Some((imgW, imgH, gray)))

    // ---------------------------------------------------------- decode

    private def inflate(data: Array[Byte]): Option[Array[Byte]] =
      try {
        val inf = new java.util.zip.Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          // needsDictionary: a preset-dictionary stream we can't serve
          // — without this guard the loop would spin forever (n = 0,
          // not finished, input not consumed) on such a payload
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            throw new java.io.EOFException
          out.write(buf, 0, n)
        }
        inf.end()
        Some(out.toByteArray)
      } catch { case scala.util.control.NonFatal(_) => None }

    /** §7.9.2.2 text-string convention: a string whose first two BYTES
      * (here chars 0–255, one per byte) are the FE FF BOM is UTF-16BE —
      * reinterpret; anything else stays the byte-per-char (PDFDoc/
      * Latin-1) reading. This is how real extractors round-trip
      * non-Latin-1 text, and what [[contentStream]]'s `utf16Hex` emits.
      */
    private def maybeUtf16(s: String): String =
      if (s.length >= 2 && s.charAt(0) == '\u00FE' && s.charAt(1) == '\u00FF') {
        val bytes = new Array[Byte](s.length - 2)
        var i = 0
        while (i < bytes.length) { bytes(i) = s.charAt(i + 2).toByte; i += 1 }
        new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
      } else s

    /** Parse one `(…)` literal string starting at `i` (which must be
      * the '('): returns (decoded string, index just past ')').
      * Handles the §7.3.4.2 escapes, octal codes, line continuations,
      * and balanced unescaped nested parentheses.
      */
    private def parseLiteral(c: String, i0: Int): (String, Int) = {
      val sb = new StringBuilder
      var i = i0 + 1
      var depth = 1
      while (i < c.length && depth > 0) {
        c.charAt(i) match {
          case '\\' if i + 1 < c.length =>
            c.charAt(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case '\n' => i += 2 // continuation
              case '\r' => i += (if (i + 2 < c.length && c.charAt(i + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = i + 1
                while (k < c.length && k < i + 4 &&
                  c.charAt(k) >= '0' && c.charAt(k) <= '7') {
                  v = v * 8 + (c.charAt(k) - '0'); k += 1
                }
                sb += (v & 0xff).toChar; i = k
              case other => sb += other; i += 2
            }
          case '(' => depth += 1; sb += '('; i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb += ')'
            i += 1
          case ch => sb += ch; i += 1
        }
      }
      (maybeUtf16(sb.toString), i)
    }

    /** Parse one `<…>` hex string starting at `i` (the '<'): returns
      * (decoded string, index just past '>'). Odd trailing digit is
      * padded with 0 per spec; non-hex chars are skipped.
      */
    private def parseHex(c: String, i0: Int): (String, Int) = {
      val sb = new StringBuilder
      var i = i0 + 1
      var hi = -1
      while (i < c.length && c.charAt(i) != '>') {
        val ch = c.charAt(i)
        val v = Character.digit(ch, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { sb += ((hi << 4) | v).toChar; hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) sb += (hi << 4).toChar
      (maybeUtf16(sb.toString), if (i < c.length) i + 1 else i)
    }

    /** Extract the shown text of one decoded content stream: lines of
      * `Tj`/`'`/`"`/`TJ` output, split at text-positioning operators.
      */
    private def parseContent(c: String): Seq[String] = {
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      var shown = false
      def newline(): Unit =
        if (shown) { lines += cur.toString; cur.clear(); shown = false }
      var i = 0
      while (i < c.length) {
        val ch = c.charAt(i)
        if (ch == '(') {
          val (s, ni) = parseLiteral(c, i); pending += s; i = ni
        } else if (ch == '<' && i + 1 < c.length && c.charAt(i + 1) == '<') {
          i += 2 // dictionary (inline image params &c.) — not a string
        } else if (ch == '<') {
          val (s, ni) = parseHex(c, i); pending += s; i = ni
        } else if (ch == '[' || ch == ']') {
          i += 1 // TJ array delimiters — strings accumulate across them
        } else if (ch == '%') {
          while (i < c.length && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
        } else if (ch == '/') {
          i += 1 // name operand (e.g. /F1) — skip token body below
          while (i < c.length && !c.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(c.charAt(i))) i += 1
        } else if (ch.isWhitespace) {
          i += 1
        } else if (ch == '\'' || ch == '"') {
          // shorthand shows: move to next line, then show pending
          newline()
          cur ++= pending.mkString; pending.clear(); shown = true
          i += 1
        } else {
          val start = i
          while (i < c.length && !c.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(c.charAt(i))) i += 1
          // a stray delimiter none of the branches above claimed
          // (PostScript braces, an unmatched ')' or '>'): the token is
          // empty and i has not advanced — skip the char, or this loop
          // would spin forever on malformed content (a hang, which the
          // NonFatal catch can never rescue)
          if (i == start) i += 1
          val tok = c.substring(start, i)
          tok match {
            case "Tj" | "TJ" =>
              cur ++= pending.mkString; pending.clear(); shown = true
            case "Td" | "TD" | "T*" =>
              newline(); pending.clear()
            case "BT" | "ET" =>
              newline(); pending.clear()
            case t if t.nonEmpty &&
              (t.charAt(0).isDigit || t.charAt(0) == '-' ||
                t.charAt(0) == '+' || t.charAt(0) == '.') =>
              () // numeric operand (kern values, coordinates) — ignore
            case _ =>
              pending.clear() // any other operator consumes its operands
          }
        }
      }
      newline()
      lines.toSeq
    }

    /** Linear object scan shared by text and image extraction: every
      * `stream`…`endstream` block whose enclosing dict passes `keep`
      * as (dict, DECODED data) — /FlateDecode inflated,
      * /Length-authoritative bounds, tolerant of broken xrefs and
      * truncation (blocks that fail to decode are skipped). The
      * filter runs BEFORE decoding, so a caller that wants only
      * content streams never inflates a multi-megapixel image payload
      * (and vice versa) — peak memory stays one decoded stream of the
      * kind asked for. Returns Nil for anything that is not a PDF.
      */
    private def scanStreams(bytes: Array[Byte],
                            keep: String => Boolean)
        : Seq[(String, Array[Byte])] = {
      if (bytes == null || bytes.length < 16) return Nil
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val s = new String(bytes, latin1)
      if (!s.startsWith("%PDF-")) return Nil
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Array[Byte])]
      var from = 0
      var found = true
      while (found) {
        val k = s.indexOf("stream", from)
        if (k < 0) found = false
        else {
          // dict between the enclosing "obj" and the keyword decides
          // the filter; "endstream" contains "stream", so only treat
          // a keyword not preceded by "end" as a stream start
          val isStart = k < 3 || s.regionMatches(k - 3, "end", 0, 3) == false
          if (!isStart) from = k + 6
          else {
            var ds = k + 6
            if (ds < s.length && s.charAt(ds) == '\r') ds += 1
            if (ds < s.length && s.charAt(ds) == '\n') ds += 1
            val de = s.indexOf("endstream", ds)
            if (de < 0) { found = false }
            else {
              val objStart = math.max(0, s.lastIndexOf("obj", k))
              val dict = s.substring(objStart, k)
              // /Length is authoritative when sane — trimming the
              // EOL before "endstream" by inspection would corrupt a
              // compressed payload whose own last byte is \r or \n
              val lenRe = "/Length\\s+(\\d+)".r
              val end = lenRe.findFirstMatchIn(dict)
                .map(_.group(1).toInt)
                .filter(l => ds + l <= de)
                .map(ds + _)
                .getOrElse {
                  var e = de
                  if (e > ds && s.charAt(e - 1) == '\n') e -= 1
                  if (e > ds && s.charAt(e - 1) == '\r') e -= 1
                  e
                }
              if (keep(dict)) {
                val raw = java.util.Arrays.copyOfRange(bytes, ds, end)
                val dataOpt =
                  if (dict.contains("/FlateDecode")) inflate(raw)
                  else Some(raw)
                dataOpt.foreach(data => out += ((dict, data)))
              }
              from = de + 9
            }
          }
        }
      }
      out.toSeq
    }

    private val imageDictRe =
      java.util.regex.Pattern.compile("/Subtype\\s*/Image")

    private def isImageDict(dict: String): Boolean =
      imageDictRe.matcher(dict).find()

    /** Extract all shown text of a PDF payload: content-stream lines
      * joined with `\n`, streams in document order. Image XObject
      * streams are excluded BY DICT (pixel bytes that happen to
      * contain `BT` must not parse as text). `None` for null,
      * truncated, non-PDF, or text-free payloads — never a throw.
      */
    def extractText(bytes: Array[Byte]): Option[String] =
      try {
        val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
        val lines = scanStreams(bytes, d => !isImageDict(d))
          .flatMap { case (_, data) =>
            val c = new String(data, latin1)
            if (c.contains("BT")) parseContent(c) else Nil
          }
        if (lines.isEmpty) None else Some(lines.mkString("\n"))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** One embedded raster: 8-bit /DeviceGray row-major samples. */
    final case class PdfImage(width: Int, height: Int, gray: Array[Byte])

    /** Every decodable embedded image XObject, in document order. The
      * supported subset is the lossless one the fixtures plant (8-bit
      * /DeviceGray, raw or /FlateDecode); JPEG (/DCTDecode) and other
      * color spaces are skipped, not failed — same degradation contract
      * as every codec here (corrupt/unsupported → fewer rows, never a
      * task failure).
      */
    def extractImages(bytes: Array[Byte]): Seq[PdfImage] =
      try {
        val wRe = "/Width\\s+(\\d+)".r
        val hRe = "/Height\\s+(\\d+)".r
        scanStreams(bytes, isImageDict).flatMap { case (dict, data) =>
          val supported = dict.contains("/DeviceGray") &&
            dict.matches("(?s).*?/BitsPerComponent\\s+8.*")
          if (!supported) None
          else for {
            // toIntOption: one hostile /Width must skip ONE stream,
            // not drop the asset's other images via the outer catch
            w <- wRe.findFirstMatchIn(dict).flatMap(_.group(1).toIntOption)
            h <- hRe.findFirstMatchIn(dict).flatMap(_.group(1).toIntOption)
            if w > 0 && h > 0 && data.length.toLong == w.toLong * h
          } yield PdfImage(w, h, data)
        }
      } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Extraction result row — null text = unextractable payload. */
  final case class PdfText(asset_id: Long, media_type: String,
                           n_bytes: Long, text: Option[String],
                           n_chars: Option[Long])

  /** Distributed PDF text extraction: binary payloads → extracted
    * text, one partition at a time, payloads never on the driver —
    * the document-modality sibling of [[Multimodal.decodeImageStats]]
    * and [[Audio.decodeAudioStats]]. Non-document and unextractable
    * rows get null text, never a task failure.
    */
  def extractPdfText(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[PdfText] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val nb = if (a.content == null) 0L else a.content.length.toLong
      val t =
        if (a.media_type == "document") PdfCodec.extractText(a.content)
        else None
      PdfText(a.asset_id, a.media_type, nb, t, t.map(_.length.toLong))
    })
  }

  /** One row per embedded image: exact integer pixel stats. */
  final case class PdfImageStats(asset_id: Long, img_idx: Int,
                                 width: Int, height: Int,
                                 n_pixels: Long, sum_gray: Long)

  /** Distributed embedded-image extraction — the document↔multimodal
    * bridge: every decodable image XObject of every PDF asset as one
    * stats row (exact integer sum, so the oracle replays it without a
    * float). Unsupported/corrupt assets contribute zero rows; payloads
    * never leave their partition.
    */
  def extractPdfImages(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[PdfImageStats] = {
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val imgs =
        if (a.media_type == "document") PdfCodec.extractImages(a.content)
        else Nil
      imgs.zipWithIndex.map { case (im, i) =>
        var sum = 0L
        var p = 0
        while (p < im.gray.length) { sum += im.gray(p) & 0xff; p += 1 }
        PdfImageStats(a.asset_id, i, im.width, im.height,
          im.gray.length.toLong, sum)
      }
    })
  }

  /** Render REAL corpus text into PDF assets — one single-page PDF
    * per document, the document's text as one show op: a literal
    * string for Latin-1 text (escapes applied by the encoder, so
    * parentheses/backslashes in corpus text survive), a `<FEFF…>`
    * UTF-16BE hex string for anything beyond Latin-1 (§7.9.2.2 — the
    * encoder's byte path is ISO-8859-1, which would otherwise fold
    * non-Latin-1 chars to '?'). Extraction is then an exact round
    * trip for ARBITRARY Unicode corpus text:
    * `extractText(encodeCorpusPdfs(docs)) == text`, which is what
    * makes the q119 oracle a straight read of the documents table —
    * the whole encoder→Flate→parser path must reproduce every corpus
    * byte to pass. Runs distributed; text never leaves its partition.
    */
  def encodeCorpusPdfs(spark: SparkSession,
                       docs: org.apache.spark.sql.DataFrame,
                       idCol: String = "doc_id", textCol: String = "text")
      : Dataset[Asset] = {
    import spark.implicits._
    docs.select(col(idCol), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        Asset(id, "document", PdfCodec.encodePdf(Seq(text)),
          None, None, None, Some("pdf"))
    }
  }

  /** Planted PDF fixtures from the documents table: a three-line
    * earnings-note PDF per doc whose text is pure arithmetic on
    * `doc_id`, so a SQL oracle predicts the EXACT extracted string
    * without parsing a byte. Line 1 carries literal parentheses
    * (escape-handling in the oracle-gated path); line 2 is emitted as
    * a TJ array with a kern number and a hex-string half (both string
    * syntaxes in the oracle-gated path). Every 37th asset is
    * truncated to its first 8 bytes (must extract to null).
    */
  def plantedPdfs(spark: SparkSession, docs: org.apache.spark.sql.DataFrame)
      : Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val lines = Seq(
        s"report $id earnings (net) summary",
        s"revenue ${id * 31 + 1} usd",
        s"total ${id * 7} qtr ${id % 4}")
      val pdf = PdfCodec.encodePdf(lines)
      val content =
        if (id % 37 == 0) java.util.Arrays.copyOf(pdf, 8) else pdf
      Asset(id, "document", content, None, None, None, Some("pdf"))
    }
  }
}
