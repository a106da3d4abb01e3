package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and per-batch decode /
  * feature-extraction runs in `mapPartitions` with a per-partition
  * decoder instance (the Scala analog of `mapInPandas` batch UDFs).
  *
  * IMAGE decode is REAL: the JDK bundles `javax.imageio` readers for
  * PNG/JPEG/GIF/BMP, so [[ImageIoDecoder]] / [[decodeImageStats]]
  * produce actual width/height/band/pixel statistics (q108 gates them
  * against a DuckDB-predicted oracle over planted fixtures). The
  * container has no AUDIO/VIDEO codecs, so [[StubDecoder]] remains the
  * clearly-marked deterministic fake for those — the Spark-side
  * contract (schema, partitioning, batch shape) is identical, and
  * swapping in a JNI/FFI codec changes one class.
  */
object Multimodal {

  /** Schema for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  final case class Asset(asset_id: Long, media_type: String,
                         content: Array[Byte], width: Option[Int],
                         height: Option[Int], duration_ms: Option[Long],
                         codec: Option[String])

  final case class AssetFeatures(asset_id: Long, media_type: String,
                                 n_bytes: Long, feature: Array[Float])

  /** Decoder abstraction — one instance per partition. */
  trait Decoder extends Serializable {
    def features(a: Asset): AssetFeatures
  }

  /** STUB: real decode needs codec libraries not present in this
    * container. Produces a deterministic 8-dim "embedding" from the
    * byte content so tests exercise the full distributed path.
    */
  final class StubDecoder extends Decoder {
    override def features(a: Asset): AssetFeatures = {
      val bytes = if (a.content == null) Array.emptyByteArray else a.content
      val f = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        f(i % 8) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      AssetFeatures(a.asset_id, a.media_type, bytes.length.toLong, f)
    }
  }

  /** Distributed feature extraction: batch-per-partition decode.
    * Binary payloads stay off the driver; only fixed-size features
    * shuffle afterwards.
    */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      mkDecoder: () => Decoder = () => new StubDecoder)
      : Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val dec = mkDecoder() // one decoder per partition
      it.map(dec.features)
    }
  }

  /** Real JDK image codec (javax.imageio — PNG/JPEG/GIF/BMP readers
    * ship with every JRE; no container codec needed). Kept tiny and
    * static so executor-side decode has no per-row setup beyond the
    * shared reader registry.
    */
  object ImageCodec {
    // per-decode tmp-file caching off: small payloads decode in memory
    locally { javax.imageio.ImageIO.setUseCache(false) }

    /** Encode a grayscale `w`×`h` PNG with per-pixel values from `f`
      * (clamped to 0–255) — the deterministic fixture generator
      * behind the planted-image oracles: every stat/hash the decoder
      * recovers is predictable arithmetic on the plant parameters
      * because PNG grayscale is lossless.
      */
    def encodeGrayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, math.max(0, math.min(255, f(x, y))))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode a solid-gray `w`×`h` PNG — q108's planted fixture. */
    def encodePng(w: Int, h: Int, gray: Int): Array[Byte] =
      encodeGrayPng(w, h, (_, _) => gray)

    /** 64-bit difference hash (dHash — the standard perceptual
      * near-dup fingerprint; see e.g. the pHash family used for
      * LAION-scale image dedup): downsample band 0 to a 9×8 grid by
      * EXACT integer area-average (cell (i,j) covers
      * x ∈ [i·w/9, (i+1)·w/9) × y ∈ [j·h/8, (j+1)·h/8), floor
      * boundaries), then bit (j·8+i) = mean(i+1,j) > mean(i,j) —
      * the horizontal-gradient sign. The comparison cross-multiplies
      * integer sums (no floating point), so the hash is
      * bit-reproducible by any engine from the same pixel values —
      * q113's oracle recomputes it in SQL from the plant parameters
      * without decoding a byte. Uniform-brightness shifts leave every
      * gradient sign unchanged, so the hash is exposure-invariant by
      * construction (pinned in MultimodalSpec).
      *
      * `None` for undecodable payloads or images smaller than the
      * 9×8 grid — corrupt rows yield nulls, never task failures.
      */
    def dHash64(bytes: Array[Byte]): Option[Long] =
      try {
        if (bytes == null || bytes.isEmpty) None
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null || img.getWidth < 9 || img.getHeight < 8) None
          else {
            val r = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            val sums = Array.ofDim[Long](9, 8)
            val cnts = Array.ofDim[Long](9, 8)
            var y = 0
            while (y < h) {
              val j = math.min(y * 8 / h, 7)
              var x = 0
              while (x < w) {
                val i = math.min(x * 9 / w, 8)
                sums(i)(j) += r.getSample(x, y, 0)
                cnts(i)(j) += 1
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                if (sums(i + 1)(j) * cnts(i)(j) > sums(i)(j) * cnts(i + 1)(j))
                  hash |= 1L << (j * 8 + i)
                i += 1
              }
              j += 1
            }
            Some(hash)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode a multi-frame (animated) grayscale GIF — frame `f`'s
      * pixel values from `fs(f)`, full-size frames, default frame
      * metadata. GIF is palette-based and lossless for ≤256 distinct
      * values, so planted solid-gray frames decode back to their
      * exact values — the fixture generator behind the q117
      * frame-decode oracle.
      */
    def encodeGrayGifFrames(w: Int, h: Int,
                            fs: Seq[(Int, Int) => Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      // non-interlaced frames: the JDK pairing writes interlaced GIFs
      // the JDK reader misassembles for small heights (zeroed rows —
      // observed empirically), and interlace buys nothing here
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      // explicit 256-gray indexed model: the GIF writer stores the
      // palette verbatim, keeping planted values EXACT (TYPE_BYTE_GRAY
      // would be requantized through the writer's default palette)
      val ramp = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      fs.foreach { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, math.max(0, math.min(255, f(x, y))))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          param)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      bos.toByteArray
    }

    /** Per-frame stats of a multi-frame payload (animated GIF — the
      * one moving-picture container the JDK decodes for real):
      * (frame_index, width, height, mean luma), luma via `getRGB`'s
      * red channel so palette indirection can't leak indices. Empty
      * seq for undecodable payloads; a container with n frames yields
      * exactly n entries.
      */
    def decodeFrameStats(bytes: Array[Byte]): Seq[(Int, Int, Int, Double)] =
      try {
        if (bytes == null || bytes.isEmpty) return Seq.empty
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // iis.close() releases the memory-cache buffer eagerly — this
        // runs once per asset in the hot mapPartitions path, so leaving
        // it to GC would pile up native/heap cache buffers
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return Seq.empty
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val n = reader.getNumImages(true)
            (0 until n).map { i =>
              val img = reader.read(i)
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  sum += (img.getRGB(x, y) >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              (i, w, h, sum / (w.toLong * h))
            }
          } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }

    /** Decode any ImageIO-readable payload to
      * (width, height, bands, mean sample value of band 0 in 0–255).
      * `None` for undecodable/truncated/empty bytes — corrupt rows
      * yield nulls, never task failures.
      */
    def decodeStats(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
      try {
        if (bytes == null || bytes.isEmpty) None
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val r = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Some((w, h, r.getNumBands, sum / (w.toLong * h)))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded per-image statistics row — null stats = undecodable. */
  final case class ImageStats(asset_id: Long, media_type: String,
                              width: Option[Int], height: Option[Int],
                              bands: Option[Int], mean_luma: Option[Double])

  /** Distributed REAL image decode: binary payloads → per-image
    * stats via `javax.imageio`, one partition at a time, payloads
    * never on the driver. Non-image and undecodable rows produce null
    * stats (the corrupt-bytes contract MultimodalSpec pins).
    */
  def decodeImageStats(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[ImageStats] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val stats =
        if (a.media_type == "image") ImageCodec.decodeStats(a.content)
        else None
      stats match {
        case Some((w, h, b, m)) =>
          ImageStats(a.asset_id, a.media_type, Some(w), Some(h), Some(b), Some(m))
        case None =>
          ImageStats(a.asset_id, a.media_type, None, None, None, None)
      }
    })
  }

  /** REAL image feature extraction — the [[Decoder]] seam backed by
    * `javax.imageio`: decodable images yield
    * [width, height, bands, mean_luma]; audio/video fall back to the
    * deterministic byte-fold (their codecs aren't in the JDK), and
    * corrupt images yield an empty feature vector rather than a task
    * failure.
    */
  final class ImageIoDecoder extends Decoder {
    private val fallback = new StubDecoder
    override def features(a: Asset): AssetFeatures =
      if (a.media_type != "image") fallback.features(a)
      else {
        val nb = if (a.content == null) 0L else a.content.length.toLong
        ImageCodec.decodeStats(a.content) match {
          case Some((w, h, b, m)) =>
            AssetFeatures(a.asset_id, a.media_type, nb,
              Array(w.toFloat, h.toFloat, b.toFloat, m.toFloat))
          case None =>
            AssetFeatures(a.asset_id, a.media_type, nb, Array.empty[Float])
        }
      }
  }

  /** Planted image fixtures from the documents table: a solid-gray
    * PNG per doc with dimensions/shade that are pure arithmetic on
    * `doc_id` — so a SQL oracle that never decodes a byte still
    * predicts every stat [[decodeImageStats]] recovers. Every 37th
    * asset is truncated to its first 8 bytes (a corrupt payload that
    * must decode to nulls).
    */
  def plantedImages(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 1 + (id % 7).toInt
      val h = 1 + (id % 5).toInt
      val g = ((id * 17) % 256).toInt
      val png = ImageCodec.encodePng(w, h, g)
      val content =
        if (id % 37 == 0) java.util.Arrays.copyOf(png, 8) else png
      Asset(id, "image", content, Some(w), Some(h), None, Some("png"))
    }
  }

  /** Distributed perceptual hashing: image payloads → 64-bit dHash,
    * one decode per row inside the partition, payloads never on the
    * driver. Output is the slim (asset_id, dhash) frame — 16 bytes a
    * row no matter the image size, which is the whole point: at
    * 100 TB of images, everything downstream of this map (banding,
    * bucket joins, Hamming verification) moves longs, not pixels.
    * Undecodable / too-small / non-image rows get a null dhash.
    */
  def imageDHashes(spark: SparkSession, assets: Dataset[Asset]): DataFrame = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val hash =
        if (a.media_type == "image") ImageCodec.dHash64(a.content)
        else None
      (a.asset_id, hash)
    }).toDF("asset_id", "dhash")
  }

  /** Image near-duplicate pairs from dHash fingerprints: the
    * LAION-style image-dedup path. Rides [[Dedup.bandedHammingPairs]]
    * — 16-bit band buckets, hot-bucket cap, Hamming verify — so the
    * join is |bucket-collisions|, never |images|². Complete for
    * `maxHamming` ≤ 3 (4 disjoint bands, pigeonhole); q113 gates that
    * completeness against an all-pairs SQL oracle. Returns
    * (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = 200): DataFrame =
    Dedup.bandedHammingPairs(
      hashes.filter(col("dhash").isNotNull)
        .select(col("asset_id").as("id"), col("dhash").as("fp")),
      maxHamming, maxBucket)

  /** Planted perceptual-hash fixtures: an 18×16 grayscale PNG per doc
    * whose pixel values depend only on the 9×8 grid cell —
    * `V(g,i,j) = (31g + 17i + 29j + 23·((g·(i+2j)) mod 13)) mod 150`
    * with `g = doc_id mod 25` — plus a +50 bump on cell (4,0) for
    * every doc_id ≡ 0 (mod 11). Same-group docs are exact hash
    * duplicates, bumped-vs-unbumped same-group docs differ in ≤ 2
    * gradient signs (Hamming 1–2 — the near-dup band), cross-group
    * hashes scatter. All values ≤ 199, so no clamping and no mod-256
    * wrap: a SQL oracle predicts every 64-bit hash in closed form
    * from (g, bump) without decoding a byte.
    */
  def plantedHashImages(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val g = (id % 25).toInt
      val bump = id % 11 == 0
      val png = ImageCodec.encodeGrayPng(18, 16, (x, y) => {
        val i = x / 2
        val j = y / 2
        (31 * g + 17 * i + 29 * j + 23 * ((g * (i + 2 * j)) % 13)) % 150 +
          (if (bump && i == 4 && j == 0) 50 else 0)
      })
      Asset(id, "image", png, Some(18), Some(16), None, Some("png"))
    }
  }

  /** One decoded frame's stats of a multi-frame (video-like) asset. */
  final case class FrameStatsRow(asset_id: Long, frame_index: Int,
                                 width: Int, height: Int, mean_luma: Double)

  /** Distributed REAL multi-frame decode — the moving-picture seam
    * made honest the same way q108/q114 did for still images and
    * audio: animated GIF is the one frame-sequence container the JDK
    * decodes without codec libraries, so for it the 1-asset→n-frame
    * explode ([[sampleFrames]]'s shape) runs over ACTUAL decoded
    * frames. True video codecs (H.264 &c.) stay behind the stub
    * seam. Corrupt/undecodable payloads yield zero frame rows, never
    * task failures; payloads never reach the driver.
    */
  def decodeVideoFrameStats(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[FrameStatsRow] = {
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      if (a.media_type != "video") Iterator.empty
      else ImageCodec.decodeFrameStats(a.content).iterator.map {
        case (i, w, h, m) => FrameStatsRow(a.asset_id, i, w, h, m)
      }
    })
  }

  /** Planted animated-GIF fixtures: per doc a w×h GIF with
    * 2 + (id mod 4) solid-gray frames, frame f's shade
    * (13·id + 31·f) mod 200 — all pure arithmetic on (doc_id, f), so
    * the SQL oracle predicts every frame row (count, dimensions,
    * exact mean luma) without decoding a byte. Every 37th payload is
    * truncated to its first 8 bytes — still carrying the GIF magic,
    * so the reader is found but the decode fails: zero frame rows.
    */
  def plantedGifs(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 3 + (id % 4).toInt
      val h = 2 + (id % 3).toInt
      val nf = 2 + (id % 4).toInt
      val frames = (0 until nf).map { f =>
        val g = ((id * 13 + 31 * f) % 200).toInt
        (_: Int, _: Int) => g
      }
      val gif = ImageCodec.encodeGrayGifFrames(w, h, frames)
      val content =
        if (id % 37 == 0) java.util.Arrays.copyOf(gif, 8) else gif
      Asset(id, "video", content, Some(w), Some(h), Some(nf * 100L),
        Some("gif"))
    }
  }

  /** Payload→payload transform abstraction (resize, transcode) — one
    * instance per partition, same batch plumbing as [[Decoder]].
    */
  trait Transformer extends Serializable {
    def apply(a: Asset): Asset
  }

  /** STUB image resize: a real impl decodes, scales, re-encodes via a
    * codec library. The deterministic fake preserves the contract —
    * width/height metadata updated, payload replaced by a smaller
    * deterministic function of the original, non-images untouched.
    */
  final class StubResize(w: Int, h: Int) extends Transformer {
    override def apply(a: Asset): Asset =
      if (a.media_type != "image" || a.content == null) a
      else {
        val target = math.max(1, math.min(a.content.length, w * h / 16))
        val step = math.max(1, a.content.length / target)
        val out = Array.tabulate(math.min(target, a.content.length)) { i =>
          a.content(math.min(i * step, a.content.length - 1))
        }
        a.copy(content = out, width = Some(w), height = Some(h))
      }
  }

  /** Distributed payload transform: binary in, binary out, never via
    * the driver.
    */
  def transformAssets(spark: SparkSession, assets: Dataset[Asset],
                      mkTransformer: () => Transformer): Dataset[Asset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val t = mkTransformer()
      it.map(t.apply)
    }
  }

  /** One sampled frame of a time-based asset. */
  final case class Frame(asset_id: Long, frame_index: Int, ts_ms: Long,
                         content: Array[Byte])

  /** STUB frame sampling: `n` evenly-spaced frames per video/audio
    * asset (images are skipped). A real impl seeks the container
    * format; the fake slices the payload deterministically — the
    * row-explosion shape (1 asset → n frame rows, payload split, never
    * collected) is the part that must scale and is real.
    */
  def sampleFrames(spark: SparkSession, assets: Dataset[Asset], n: Int)
      : Dataset[Frame] = {
    import spark.implicits._
    assets.filter(a => a.media_type != "image" && a.content != null)
      .flatMap { a =>
        val dur = a.duration_ms.getOrElse(0L)
        val len = a.content.length
        (0 until n).map { i =>
          val from = (len.toLong * i / n).toInt
          val until = (len.toLong * (i + 1) / n).toInt
          Frame(a.asset_id, i, dur * i / math.max(n, 1),
            java.util.Arrays.copyOfRange(a.content, from, math.max(from, until)))
        }
      }
  }

  /** Synthetic asset table derived from the documents corpus (the
    * testdata has no binary tables): deterministic pseudo-payloads so
    * the multimodal path is exercised end-to-end at any SF.
    */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8").take(256)
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, mt, bytes,
          width = if (mt == "image") Some(64) else None,
          height = if (mt == "image") Some(64) else None,
          duration_ms = if (mt != "image") Some(1000L + id) else None,
          codec = Some(if (mt == "image") "stub-png" else "stub-pcm"))
    }
  }
}
