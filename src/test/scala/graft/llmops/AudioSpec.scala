package graft.llmops

import graft.{SparkTestBase, Tables}
import graft.llmops.Audio.WavCodec

class AudioSpec extends SparkTestBase {
  import spark.implicits._

  // independent reference: recompute the expected hash straight from
  // the plant formula (no WAV bytes, no codec)
  private def plantHash(id: Long): Long = {
    val g = (id % 25).toInt
    val bump = id % 11 == 0
    def a(b: Int): Int =
      100 + (31 * g + 17 * b + 23 * ((g * (b + 3)) % 13)) % 150 +
        (if (bump && b == 4) 50 else 0)
    (0 until 64).foldLeft(0L) { (h, b) =>
      if (a(b + 1) > a(b)) h | (1L << b) else h
    }
  }

  test("wav round-trip: encoded square wave decodes to exact hand stats") {
    // 12 samples, half-period 2, amplitude 500: + + - - + + - - + + - -
    val s = Array.tabulate(12)(k => (if ((k / 2) % 2 == 0) 500 else -500).toShort)
    val wav = WavCodec.encodePcm16Wav(8000, 1, s)
    val st = WavCodec.decodeStats(wav).get
    assert(st.sampleRate == 8000 && st.channels == 1 && st.nFrames == 12)
    assert(st.durationMs == 12 * 1000 / 8000)
    assert(st.meanAbs == 500.0)
    assert(st.zeroCrossings == (12 - 1) / 2) // sign flips at k = 2,4,6,8,10
  }

  test("stereo: frames = samples/2, stats over channel 0 only") {
    // ch0 = [100, -100, 100], ch1 = huge values that must not leak in
    val inter = Array[Short](100, 30000, -100, 30000, 100, 30000)
    val st = WavCodec.decodeStats(WavCodec.encodePcm16Wav(44100, 2, inter)).get
    assert(st.channels == 2 && st.nFrames == 3)
    assert(st.meanAbs == 100.0 && st.zeroCrossings == 2)
  }

  test("unknown chunks are skipped; corrupt payloads decode to None") {
    val wav = WavCodec.encodePcm16Wav(8000, 1, Array[Short](1, 2, 3, 4))
    // splice a LIST chunk between "WAVE" and "fmt " (odd size → pad byte)
    val listBody = "INFOabc".getBytes("US-ASCII") // 7 bytes, padded to 8
    val bb = java.nio.ByteBuffer
      .allocate(wav.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(wav, 0, 12)
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    bb.put(0.toByte) // word-alignment pad
    bb.put(wav, 12, wav.length - 12)
    val spliced = bb.array()
    assert(WavCodec.decodeStats(spliced).exists(_.nFrames == 4))
    // corrupt: truncation, garbage, empty, non-PCM format code
    assert(WavCodec.decodeStats(java.util.Arrays.copyOf(wav, 8)).isEmpty)
    assert(WavCodec.decodeStats(java.util.Arrays.copyOf(wav, 45)).isEmpty)
    assert(WavCodec.decodeStats("not audio at all, just text bytes ok".getBytes).isEmpty)
    assert(WavCodec.decodeStats(Array.emptyByteArray).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // fmt code 3 = IEEE float
    assert(WavCodec.decodeStats(nonPcm).isEmpty)
  }

  test("energy hash matches the plant formula and is volume-invariant") {
    val docs = Seq(5L, 11L, 17L, 30L, 55L).toDF("doc_id")
    val hs = Audio.audioEnergyHashes(spark,
        Audio.plantedFingerprintAudio(spark, docs))
      .as[(Long, Option[Long])].collect().toMap
    Seq(5L, 11L, 17L, 30L, 55L).foreach { id =>
      assert(hs(id).contains(plantHash(id)), s"doc $id")
    }
    // volume invariance: triple every sample, same 64 gradient signs
    val louder = Audio.plantedFingerprintAudio(spark, docs)
      .map(a => a.copy(content = {
        val st = WavCodec.decodeStats(a.content).get
        val n = st.nFrames.toInt
        val bb = java.nio.ByteBuffer.wrap(a.content)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val samples = Array.tabulate(n)(k =>
          (bb.getShort(44 + 2 * k) * 3).toShort)
        WavCodec.encodePcm16Wav(st.sampleRate, 1, samples)
      }))
    val hs3 = Audio.audioEnergyHashes(spark, louder)
      .as[(Long, Option[Long])].collect().toMap
    assert(hs3 == hs)
    // too-short and corrupt clips fingerprint to None
    val tiny = WavCodec.encodePcm16Wav(8000, 1, Array.fill[Short](64)(5))
    assert(WavCodec.energyHash64(tiny).isEmpty)
    assert(WavCodec.energyHash64("garbage".getBytes).isEmpty)
  }

  test("banded near-dup pairs equal brute force; groups behave as planted") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id").filter($"doc_id" < 120)
    val hashes = Audio.audioEnergyHashes(spark,
      Audio.plantedFingerprintAudio(spark, docs)).cache()
    val banded = Audio.audioNearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val hs = hashes.as[(Long, Option[Long])].collect()
      .map { case (id, h) => id -> h.get }
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded == brute && brute.nonEmpty)
    // same group (doc_id mod 25), neither bumped → exact duplicates
    val h = hs.toMap
    assert(h(5L) == h(30L) && h(5L) == h(80L))
    // bumped (55 ≡ 0 mod 11) vs unbumped in the same group → the
    // near-dup band (1-2 flipped gradient signs), not exact
    val dBump = java.lang.Long.bitCount(h(55L) ^ h(5L))
    assert(dBump >= 1 && dBump <= 2)
  }

  test("distributed decode: planted stats recovered, corrupt rows null") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id").filter($"doc_id" < 100)
    val stats = Audio.decodeAudioStats(spark,
      Audio.plantedAudio(spark, docs)).cache()
    assert(stats.count() == 100)
    val good = stats.filter($"asset_id" % 37 =!= 0).collect()
    assert(good.forall { s =>
      val id = s.asset_id
      val half = 1 + (id % 5); val n = 160 + (id % 11) * 16
      s.sample_rate.contains(8000) && s.channels.contains(1) &&
        s.n_frames.contains(n) && s.duration_ms.contains(n / 8) &&
        s.mean_abs.contains((1000 + (id % 7) * 100).toDouble) &&
        s.zero_crossings.contains((n - 1) / half)
    })
    val bad = stats.filter($"asset_id" % 37 === 0).collect()
    assert(bad.nonEmpty && bad.forall(s =>
      s.sample_rate.isEmpty && s.n_frames.isEmpty && s.mean_abs.isEmpty))
  }
}
