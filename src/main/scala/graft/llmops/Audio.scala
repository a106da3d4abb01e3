package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio decode for the multimodal column — the audio sibling of
  * [[Multimodal.ImageCodec]]'s round-7 honesty upgrade.
  *
  * The container ships no audio codec *libraries*, but canonical
  * RIFF/WAVE PCM needs none: the format is a 44-byte header plus raw
  * little-endian samples, parseable with `java.nio.ByteBuffer` alone.
  * So for WAV/PCM the decode is the real thing — actual sample values
  * out of actual container bytes — while compressed formats (MP3/AAC/
  * Opus) stay behind the documented [[Multimodal.StubDecoder]] seam
  * exactly like video does.
  *
  * Scale shape mirrors the image tier: the payload-touching stage is
  * ONE `mapPartitions` decode pass (payloads never leave their input
  * partition or reach the driver); everything downstream moves
  * fixed-size stat rows or 16-byte (id, fingerprint-long) rows. The
  * fingerprint is a 1-D dHash over frame ENERGIES — integer
  * sums of squares, compared pairwise for their gradient sign — so it
  * is bit-reproducible by any engine from the sample values and
  * volume-invariant by construction (scaling every sample by c scales
  * every frame energy by c², leaving all 64 comparisons unchanged),
  * the audio analog of dHash's exposure invariance. Near-dup pairs
  * then ride the SAME [[Dedup.bandedHammingPairs]] machinery text
  * SimHash and image dHash use.
  *
  * Reference-analog note: the reference downloads opaque binary
  * payloads and hands them to a document-understanding stage
  * (`/root/reference/README.md:17` — "downloads and parses reports
  * using advanced PDF parsing (Docling)"; byte handling in
  * `/root/reference/src/download_reports.py:400-418`); this module is
  * the audio instance of that binary column's decode/fingerprint
  * surface, per the training-data extension brief.
  */
object Audio {

  import Multimodal.Asset

  /** Dependency-free RIFF/WAVE PCM-16 codec. */
  object WavCodec {

    /** Encode interleaved 16-bit PCM frames as a canonical WAV file
      * (RIFF header, `fmt ` chunk, `data` chunk — the deterministic
      * fixture generator behind the planted-audio oracles; PCM is
      * lossless, so every stat the decoder recovers is predictable
      * arithmetic on the plant parameters).
      */
    def encodePcm16Wav(sampleRate: Int, channels: Int,
                       samples: Array[Short]): Array[Byte] = {
      require(channels >= 1 && samples.length % channels == 0,
        "samples must hold whole interleaved frames")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort)  // block align
        .putShort(16)                      // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Parsed PCM payload: format parameters plus a view of the raw
      * sample bytes (`dataPos` into the original array). Channel-0
      * sample `k` lives at `dataPos + k * blockAlign`.
      */
    private final case class Pcm(bytes: Array[Byte], sampleRate: Int,
                                 channels: Int, dataPos: Int, nFrames: Int) {
      def ch0(k: Int): Int = {
        val p = dataPos + k * channels * 2
        ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toInt
      }
    }

    /** Strict chunk-walking parse: `RIFF…WAVE`, then chunks at word
      * alignment until both `fmt ` (must be PCM, 16-bit) and `data`
      * (must be fully present — a truncated payload is corrupt, not
      * "approximately decoded") are found. Unknown chunks (`LIST`,
      * `fact`, …) are skipped, matching real-world WAV files.
      * `None` for anything malformed — corrupt rows yield nulls,
      * never task failures.
      */
    private def parse(bytes: Array[Byte]): Option[Pcm] = {
      if (bytes == null || bytes.length < 44) return None
      def tag(p: Int): String =
        new String(bytes, p, 4, "US-ASCII")
      def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      def u32(p: Int): Long =
        (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
          ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var rate = 0; var ch = 0; var fmtOk = false
      var dataPos = -1; var dataLen = 0L
      while (pos + 8 <= bytes.length && (dataPos < 0 || !fmtOk)) {
        val id = tag(pos)
        val size = u32(pos + 4)
        if (size > Int.MaxValue - 8L) return None
        val body = pos + 8
        if (id == "fmt ") {
          if (size < 16 || body + 16 > bytes.length) return None
          fmtOk = u16(body) == 1 && u16(body + 14) == 16
          ch = u16(body + 2)
          rate = u32(body + 4).toInt
        } else if (id == "data") {
          dataPos = body
          dataLen = size
        }
        pos = body + size.toInt + (size.toInt & 1)
      }
      if (!fmtOk || ch < 1 || rate <= 0 || dataPos < 0) return None
      val block = ch * 2
      if (dataLen % block != 0 || dataPos + dataLen > bytes.length) return None
      Some(Pcm(bytes, rate, ch, dataPos, (dataLen / block).toInt))
    }

    /** Decoded per-clip statistics over channel 0 — every field exact
      * integer arithmetic except `meanAbs` (an integer sum divided
      * once), so a SQL oracle predicts all of them from planted
      * parameters. `durationMs` is floor(frames·1000/rate);
      * `zeroCrossings` counts sign changes (negative vs non-negative)
      * between consecutive frames.
      */
    final case class WavStats(sampleRate: Int, channels: Int, nFrames: Long,
                              durationMs: Long, meanAbs: Double,
                              zeroCrossings: Long)

    def decodeStats(bytes: Array[Byte]): Option[WavStats] =
      try parse(bytes).map { p =>
        var sumAbs = 0L; var zc = 0L
        var prevNeg = false
        var k = 0
        while (k < p.nFrames) {
          val s = p.ch0(k)
          sumAbs += math.abs(s)
          val neg = s < 0
          if (k > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          k += 1
        }
        WavStats(p.sampleRate, p.channels, p.nFrames.toLong,
          p.nFrames.toLong * 1000L / p.sampleRate,
          if (p.nFrames == 0) 0.0 else sumAbs.toDouble / p.nFrames, zc)
      } catch { case scala.util.control.NonFatal(_) => None }

    /** 64-bit energy dHash: split channel 0 into 65 equal frames
      * (exact integer boundaries — frame `b` covers samples
      * `k ∈ [b·n/65, (b+1)·n/65)`), per-frame energy = Σ s² (Long —
      * headroom to ~8·10⁹ samples per frame at full scale), then
      * bit `b` = E(b+1) > E(b): the temporal energy-gradient sign,
      * the 1-D sibling of [[Multimodal.ImageCodec.dHash64]]'s spatial
      * gradient. Integer throughout ⇒ bit-reproducible; energy is
      * quadratic in amplitude ⇒ volume-invariant (pinned in
      * AudioSpec). `None` for undecodable payloads or clips shorter
      * than 65 frames.
      */
    def energyHash64(bytes: Array[Byte]): Option[Long] =
      try parse(bytes).flatMap { p =>
        val bins = 65
        if (p.nFrames < bins) None
        else {
          val e = new Array[Long](bins)
          val n = p.nFrames.toLong
          var k = 0
          while (k < p.nFrames) {
            val s = p.ch0(k).toLong
            // k.toLong: k * 65 overflows Int past ~33M frames (~12.5
            // min at 44.1 kHz) — a negative index would be swallowed
            // by the NonFatal catch, silently excluding long clips
            e(((k.toLong * bins) / n).toInt) += s * s
            k += 1
          }
          var hash = 0L
          var b = 0
          while (b < 64) {
            if (e(b + 1) > e(b)) hash |= 1L << b
            b += 1
          }
          Some(hash)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded per-clip statistics row — null stats = undecodable. */
  final case class AudioStats(asset_id: Long, media_type: String,
                              sample_rate: Option[Int], channels: Option[Int],
                              n_frames: Option[Long], duration_ms: Option[Long],
                              mean_abs: Option[Double],
                              zero_crossings: Option[Long])

  /** Distributed REAL audio decode: binary WAV payloads → per-clip
    * stats, one partition at a time, payloads never on the driver.
    * Non-audio and undecodable rows produce null stats (the
    * corrupt-bytes contract AudioSpec pins, same as images).
    */
  def decodeAudioStats(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[AudioStats] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val stats =
        if (a.media_type == "audio") WavCodec.decodeStats(a.content)
        else None
      stats match {
        case Some(s) =>
          AudioStats(a.asset_id, a.media_type, Some(s.sampleRate),
            Some(s.channels), Some(s.nFrames), Some(s.durationMs),
            Some(s.meanAbs), Some(s.zeroCrossings))
        case None =>
          AudioStats(a.asset_id, a.media_type, None, None, None, None,
            None, None)
      }
    })
  }

  /** Distributed audio fingerprinting: payloads → 64-bit energy
    * dHash, the slim (asset_id, ahash) frame. Same point as
    * [[Multimodal.imageDHashes]]: at 100 TB of audio everything
    * downstream of this single decode pass moves longs, not samples.
    */
  def audioEnergyHashes(spark: SparkSession, assets: Dataset[Asset])
      : DataFrame = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val hash =
        if (a.media_type == "audio") WavCodec.energyHash64(a.content)
        else None
      (a.asset_id, hash)
    }).toDF("asset_id", "ahash")
  }

  /** Audio near-duplicate pairs from energy-dHash fingerprints —
    * rides [[Dedup.bandedHammingPairs]] (16-bit band buckets,
    * hot-bucket cap, exact Hamming verify), complete for
    * `maxHamming` ≤ 3 by pigeonhole; q115 gates that completeness
    * against an all-pairs SQL oracle. Returns (id_a, id_b, hamming),
    * id_a < id_b.
    */
  def audioNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = 200): DataFrame =
    Dedup.bandedHammingPairs(
      hashes.filter(col("ahash").isNotNull)
        .select(col("asset_id").as("id"), col("ahash").as("fp")),
      maxHamming, maxBucket)

  /** Planted WAV fixtures from the documents table: a mono 8 kHz
    * square wave per doc with half-period, amplitude, and length that
    * are pure arithmetic on `doc_id` — so a SQL oracle that never
    * parses a byte still predicts every stat [[decodeAudioStats]]
    * recovers: mean |sample| = amplitude exactly, zero crossings =
    * ⌊(n−1)/half⌋, duration = n/8 ms (n is a multiple of 16). Every
    * 37th asset is truncated to its first 8 bytes (corrupt payload →
    * null stats).
    */
  def plantedAudio(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val half = 1 + (id % 5).toInt
      val amp = (1000 + (id % 7) * 100).toInt
      val n = 160 + (id % 11).toInt * 16
      val samples = Array.tabulate(n) { k =>
        (if ((k / half) % 2 == 0) amp else -amp).toShort
      }
      val wav = WavCodec.encodePcm16Wav(8000, 1, samples)
      val content =
        if (id % 37 == 0) java.util.Arrays.copyOf(wav, 8) else wav
      Asset(id, "audio", content, None, None, Some(n / 8L), Some("pcm_s16le"))
    }
  }

  /** Planted fingerprint fixtures — the audio analog of
    * [[Multimodal.plantedHashImages]]: 260 samples = exactly 4 per
    * energy frame, constant within each frame at
    * `A(g,b) = 100 + (31g + 17b + 23·((g·(b+3)) mod 13)) mod 150`
    * with `g = doc_id mod 25`, plus a +50 bump on frame 4 for every
    * doc_id ≡ 0 (mod 11). Energies are 4·A², all positive, so bit b
    * ⇔ A(g,b+1) > A(g,b): same-group docs are exact hash duplicates,
    * bumped-vs-unbumped same-group docs differ in ≤ 2 gradient signs
    * (the near-dup band), cross-group hashes scatter — and a SQL
    * oracle predicts every 64-bit hash in closed form.
    */
  def plantedFingerprintAudio(spark: SparkSession, docs: DataFrame)
      : Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val g = (id % 25).toInt
      val bump = id % 11 == 0
      val samples = Array.tabulate(260) { k =>
        val b = k / 4
        (100 + (31 * g + 17 * b + 23 * ((g * (b + 3)) % 13)) % 150 +
          (if (bump && b == 4) 50 else 0)).toShort
      }
      Asset(id, "audio", WavCodec.encodePcm16Wav(8000, 1, samples),
        None, None, Some(260L * 1000 / 8000), Some("pcm_s16le"))
    }
  }
}
