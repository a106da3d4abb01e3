package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the standard crawl-archive format)
  * source, JDK-only. The reference's pipeline IS a crawler
  * (`enhanced_selenium_scraper.py` walks IR sites page by page); at
  * platform scale the crawl side delivers WARC files, and this source
  * turns them into the (url, status, payload) rows every downstream
  * tier here consumes (clean_html/extract_links, the link classifiers,
  * the document pipeline).
  *
  * Spark shape: WARC files are NOT splittable (gzip members, framed
  * records), so the right unit of parallelism is the FILE — Spark's
  * `binaryFile` source gives one row per file, and the record parse
  * runs as a per-row flatMap inside the partition. Crawl archives are
  * conventionally written at ~1 GB/file precisely so that file-level
  * parallelism is enough; payload bytes never reach the driver.
  *
  * Format subset (the records a data pipeline consumes):
  *  - `WARC/1.0` / `WARC/1.1` version line, CRLF header block,
  *    `Content-Length`-framed body, CRLF CRLF record separator;
  *  - gzip transparently (magic-sniffed; java's GZIPInputStream
  *    consumes multi-member concatenations, the standard .warc.gz
  *    layout of one member per record);
  *  - for `WARC-Type: response` records carrying `application/http`,
  *    the HTTP status line and headers are parsed off and the row's
  *    `content` is the HTTP BODY (what a consumer actually wants);
  *    other record types (warcinfo, request, metadata) pass through
  *    with their raw block as content.
  *
  * Truncated/corrupt tails yield the records parsed so far — never a
  * task failure (the q108/q114/q118 codec contract).
  */
object Warc extends Serializable {

  final case class WarcRecord(warc_type: String,
                              target_uri: Option[String],
                              warc_date: Option[String],
                              content_type: Option[String],
                              http_status: Option[Int],
                              http_content_type: Option[String],
                              content: Array[Byte])

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // ------------------------------------------------------------ encode

  /** Encode one response record: a full HTTP response block framed by
    * the WARC header. `body` is the payload (e.g. HTML bytes).
    */
  def encodeResponse(uri: String, date: String, body: Array[Byte],
                     status: Int = 200,
                     httpContentType: String = "text/html"): Array[Byte] = {
    val http = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(latin1) ++ body
    val header = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(latin1)
    header ++ http ++ "\r\n\r\n".getBytes(latin1)
  }

  /** Encode a warcinfo header record (every real WARC file opens with
    * one — fixtures should too, so parsers can't cheat by assuming
    * response-only files).
    */
  def encodeWarcinfo(filename: String, date: String): Array[Byte] = {
    val body = s"software: graft\r\nisPartOf: $filename\r\n".getBytes(latin1)
    val header = ("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(latin1)
    header ++ body ++ "\r\n\r\n".getBytes(latin1)
  }

  /** Concatenate records into one file payload, optionally as the
    * standard one-gzip-member-per-record .warc.gz layout.
    */
  def encodeFile(records: Seq[Array[Byte]], gzip: Boolean = false)
      : Array[Byte] =
    if (!gzip) records.flatten.toArray
    else records.map { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.close()
      bos.toByteArray
    }.flatten.toArray

  // ------------------------------------------------------------ decode

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      // a truncated/corrupt member: keep every byte already inflated,
      // so gzip truncation degrades exactly like plain truncation —
      // the records before the cut survive
      case scala.util.control.NonFatal(_) => ()
    }
    out.toByteArray
  }

  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def parseHeaders(s: String): Map[String, String] =
    s.split("\r\n").drop(1).iterator // drop the version / status line
      .flatMap { line =>
        val k = line.indexOf(':')
        if (k <= 0) None
        else Some(line.take(k).trim.toLowerCase -> line.drop(k + 1).trim)
      }.toMap

  /** Parse every record of one WARC file's bytes (gzip-sniffed).
    * A malformed or truncated tail ends the parse with the records
    * seen so far.
    */
  def parseRecords(bytesIn: Array[Byte]): Seq[WarcRecord] = {
    if (bytesIn == null || bytesIn.length < 4) return Seq.empty
    val bytes =
      if ((bytesIn(0) & 0xff) == 0x1f && (bytesIn(1) & 0xff) == 0x8b)
        gunzipAll(bytesIn)
      else bytesIn
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) ok = false
      else {
        val he = headerEnd(bytes, pos)
        if (he < 0) ok = false
        else {
          val head = new String(bytes, pos, he - pos, latin1)
          if (!head.startsWith("WARC/")) ok = false
          else {
            val h = parseHeaders(head)
            val len = h.get("content-length").flatMap(_.toLongOption)
            len match {
              case Some(l) if he + 4 + l <= bytes.length =>
                val blockStart = he + 4
                val block = java.util.Arrays.copyOfRange(
                  bytes, blockStart, blockStart + l.toInt)
                out += toRecord(h, block)
                pos = blockStart + l.toInt
              case _ => ok = false // truncated tail — keep what we have
            }
          }
        }
      }
    }
    out.toSeq
  }

  private def toRecord(h: Map[String, String],
                       block: Array[Byte]): WarcRecord = {
    val wtype = h.getOrElse("warc-type", "unknown")
    val isHttp = wtype == "response" &&
      h.get("content-type").exists(_.startsWith("application/http"))
    if (!isHttp)
      WarcRecord(wtype, h.get("warc-target-uri"), h.get("warc-date"),
        h.get("content-type"), None, None, block)
    else {
      val he = headerEnd(block, 0)
      if (he < 0)
        WarcRecord(wtype, h.get("warc-target-uri"), h.get("warc-date"),
          h.get("content-type"), None, None, block)
      else {
        val head = new String(block, 0, he, latin1)
        val status = head.split("\r\n").headOption
          .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption)
        val hh = parseHeaders(head)
        WarcRecord(wtype, h.get("warc-target-uri"), h.get("warc-date"),
          h.get("content-type"), status, hh.get("content-type"),
          java.util.Arrays.copyOfRange(block, he + 4, block.length))
      }
    }
  }

  /** Archive-replay seam for the crawl pipeline: the url → HTML map of
    * every 2xx HTML response under `path`, for
    * `Crawl.crawl(..., MapPageFetcher(Warc.pageMap(...)))` — the BFS
    * walks an ARCHIVED site snapshot hermetically, no network, same
    * classification/scoring/dedup as a live crawl. Driver-side by
    * design (the fetcher ships with the tasks), so this is for
    * snapshot-scale replays ONLY — regression-crawling a site capture,
    * not a common-crawl-sized archive. `maxPages` makes that contract
    * mechanical: more than `maxPages` qualifying pages raises an error
    * naming the scale path (`Crawl.crawlArchive` over [[cdxIndex]] +
    * [[fetchRecords]] — distributed, payloads never on the driver)
    * instead of silently OOMing the driver.
    */
  def pageMap(spark: SparkSession, path: String,
              maxPages: Int = 10000): Map[String, String] = {
    import spark.implicits._
    // limit(cap + 1) bounds the collect structurally — the driver
    // never holds more than one page beyond the cap even on the way
    // to the error
    val rows = readFiles(spark, path)
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        col("http_content_type").startsWith("text/html") &&
        col("target_uri").isNotNull)
      .select(col("target_uri"), col("content").cast("string"))
      .as[(String, String)].limit(maxPages + 1).collect()
    require(rows.length <= maxPages,
      s"Warc.pageMap: archive under '$path' holds more than $maxPages " +
        "HTML pages — pageMap is a driver-side snapshot-replay seam. " +
        "Use Crawl.crawlArchive(seeds, Warc.cdxIndex(...)) for " +
        "distributed archive replay (payloads never on the driver), " +
        "or raise maxPages explicitly.")
    rows.toMap
  }

  /** The source: one row per WARC RECORD under `path` (glob ok),
    * columns (file, warc_type, target_uri, warc_date, content_type,
    * http_status, http_content_type, content). File-level parallelism
    * via Spark's binaryFile source; per-file parse is a partition-local
    * flatMap — payloads never on the driver.
    */
  def readFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseRecords(bytes).map(r => (file, r.warc_type, r.target_uri,
          r.warc_date, r.content_type, r.http_status,
          r.http_content_type, r.content))
      }
      .toDF("file", "warc_type", "target_uri", "warc_date",
        "content_type", "http_status", "http_content_type", "content")
  }

  /** Streaming twin of [[readFiles]]: WARC shards LANDING under `dir`
    * (the continuous-crawl delivery pattern — archives appear as the
    * crawl rolls them) parsed per micro-batch into the same record
    * rows. The file source tracks seen files, so each shard is parsed
    * exactly once; parallelism and payload locality are identical to
    * the batch source (one task per file, partition-local parse).
    * readStream requires the schema up front — binaryFile's is fixed.
    */
  def readFilesStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binaryFileSchema)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseRecords(bytes).map(r => (file, r.warc_type, r.target_uri,
          r.warc_date, r.content_type, r.http_status,
          r.http_content_type, r.content))
      }
      .toDF("file", "warc_type", "target_uri", "warc_date",
        "content_type", "http_status", "http_content_type", "content")
  }

  // --------------------------------------------------- CDX-style index

  /** One gzip MEMBER's (offset, length) bounds within a .warc.gz file —
    * the unit a CDX index points at (the standard layout is one record
    * per member, so a member is independently gunzippable). Walks the
    * RFC 1952 framing by hand: header (with optional FEXTRA/FNAME/
    * FCOMMENT/FHCRC fields), raw-deflate body measured via
    * `Inflater.getBytesRead`, 8-byte CRC32+ISIZE trailer. A truncated
    * or corrupt tail ends the walk with the members seen so far.
    */
  private[io] def gzipMemberBounds(b: Array[Byte]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var pos = 0
    try {
      while (pos + 10 <= b.length &&
        (b(pos) & 0xff) == 0x1f && (b(pos + 1) & 0xff) == 0x8b) {
        val start = pos
        val flg = b(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
        if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
        if ((flg & 2) != 0) p += 2 // FHCRC
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(b, p, b.length - p)
        val buf = new Array[Byte](8192)
        while (!inf.finished() && inf.inflate(buf) >= 0 && !inf.needsInput()) ()
        if (!inf.finished()) { inf.end(); return out.toSeq } // truncated
        val consumed = inf.getBytesRead
        inf.end()
        val end = p + consumed.toInt + 8 // CRC32 + ISIZE trailer
        if (end > b.length) return out.toSeq
        out += ((start.toLong, (end - start).toLong))
        pos = end
      }
    } catch { case scala.util.control.NonFatal(_) => }
    out.toSeq
  }

  /** [[parseRecords]] plus each record's (offset, length) into the RAW
    * file bytes — compressed member bounds for .warc.gz (every record
    * of a multi-record member shares its member's bounds), byte spans
    * for plain files. The slice `bytes[offset, offset+length)` re-parses
    * to the record(s) via [[parseRecords]] — the point-read contract.
    */
  def parseRecordsIndexed(bytesIn: Array[Byte])
      : Seq[(WarcRecord, Long, Long)] = {
    if (bytesIn == null || bytesIn.length < 4) return Seq.empty
    if ((bytesIn(0) & 0xff) == 0x1f && (bytesIn(1) & 0xff) == 0x8b)
      gzipMemberBounds(bytesIn).flatMap { case (off, len) =>
        parseRecords(java.util.Arrays.copyOfRange(
          bytesIn, off.toInt, (off + len).toInt))
          .map(r => (r, off, len))
      }
    else {
      val bytes = bytesIn
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(WarcRecord, Long, Long)]
      var pos = 0
      var ok = true
      while (ok && pos < bytes.length) {
        while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) ok = false
        else {
          val start = pos
          val he = headerEnd(bytes, pos)
          if (he < 0) ok = false
          else {
            val head = new String(bytes, pos, he - pos, latin1)
            if (!head.startsWith("WARC/")) ok = false
            else {
              val h = parseHeaders(head)
              h.get("content-length").flatMap(_.toLongOption) match {
                case Some(l) if he + 4 + l <= bytes.length =>
                  val blockStart = he + 4
                  val block = java.util.Arrays.copyOfRange(
                    bytes, blockStart, blockStart + l.toInt)
                  val end = blockStart + l.toInt
                  out += ((toRecord(h, block), start.toLong,
                    (end - start).toLong))
                  pos = end
                case _ => ok = false
              }
            }
          }
        }
      }
      out.toSeq
    }
  }

  /** CDX-style index of every record under `path`: (uri, file, offset,
    * length, warc_type, http_status, n_bytes, http_content_type) — the
    * Common Crawl pattern that makes a 100 TB archive randomly
    * accessible: the index
    * is the only thing a lookup scans (slim rows, no payloads), and a
    * hit costs one `length`-byte ranged read of one file instead of a
    * full-archive pass. Built with the same file-level parallelism as
    * [[readFiles]]; payload bytes are dropped before the rows move.
    */
  def cdxIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseRecordsIndexed(bytes).map { case (r, off, len) =>
          (r.target_uri.orNull, file, off, len, r.warc_type,
            r.http_status, r.content.length.toLong,
            r.http_content_type.orNull)
        }
      }
      .toDF("uri", "file", "offset", "length", "warc_type",
        "http_status", "n_bytes", "http_content_type")
  }

  /** One point read: the record(s) at a CDX index entry, via a ranged
    * read of `length` bytes at `offset` — never a full-file scan.
    * Resolved through the Hadoop FileSystem API, so any URI scheme the
    * index was built over (`file:`, `hdfs:`, `s3a:`, …) fetches — the
    * same resolution rules as the binaryFile source [[cdxIndex]] used.
    */
  def readRecordAt(file: String, offset: Long, length: Long,
                   conf: org.apache.hadoop.conf.Configuration =
                     new org.apache.hadoop.conf.Configuration())
      : Seq[WarcRecord] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val in = p.getFileSystem(conf).open(p)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf, 0, buf.length)
      parseRecords(buf)
    } finally in.close()
  }

  /** Distributed point reads for a set of index entries: rows of
    * (file, offset, length) → the records behind them. Partition-local
    * sort by (file, offset) turns each partition's lookups into one
    * sequential sweep per file — one open, forward seeks only — so the
    * cost is proportional to the HITS, not the archive. Co-locate
    * same-file entries first (`repartition(col("file"))`) when the hit
    * set is large. Files open through Hadoop's FileSystem (the session
    * conf ships with the tasks), so the fetch side accepts every URI
    * scheme [[cdxIndex]]'s binaryFile scan does.
    */
  def fetchRecords(spark: SparkSession, index: DataFrame): DataFrame = {
    import spark.implicits._
    val hconf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    index.select(col("file"), col("offset"), col("length"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val conf = hconf.value
        val sorted = it.toSeq.sortBy(e => (e._1, e._2))
        var openFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def closeIn(): Unit = if (in != null) { in.close(); in = null }
        // a downstream limit()/take() may abandon this iterator before
        // exhaustion — close on task completion, not just on the last
        // element
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeIn())
        val out = sorted.iterator.map { case (file, off, len) =>
          if (file != openFile) {
            closeIn()
            val p = new org.apache.hadoop.fs.Path(file)
            in = p.getFileSystem(conf).open(p)
            openFile = file
          }
          val buf = new Array[Byte](len.toInt)
          in.readFully(off, buf, 0, buf.length)
          (file, off, parseRecords(buf))
        }
        new Iterator[(String, Long, Seq[WarcRecord])] {
          def hasNext: Boolean = { val h = out.hasNext
            if (!h) closeIn(); h }
          def next(): (String, Long, Seq[WarcRecord]) = out.next()
        }
      }
      .flatMap { case (file, off, recs) =>
        recs.map(r => (file, off, r.warc_type, r.target_uri,
          r.http_status, r.http_content_type, r.content))
      }
      .toDF("file", "offset", "warc_type", "target_uri", "http_status",
        "http_content_type", "content")
  }
}

/** Ships a Hadoop `Configuration` inside a task closure — Configuration
  * itself is a Writable, not `java.io.Serializable`, so it round-trips
  * through its own `write`/`readFields` (the standard Hadoop-on-Spark
  * pattern). Needed so [[Warc.fetchRecords]]'s executors resolve the
  * SAME filesystems (hdfs:/s3a: credentials and all) the driver's
  * binaryFile scan did.
  */
final class SerializableHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}
