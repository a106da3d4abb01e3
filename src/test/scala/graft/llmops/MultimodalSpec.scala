package graft.llmops

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary assets flow through distributed feature extraction") {
    val docs = Tables.documents(spark, sf0001)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val feats = Multimodal.extractFeatures(spark, assets).cache()
    assert(feats.count() == docs.count())
    val r = feats.filter($"asset_id" === 0).head()
    assert(r.feature.length == 8)
    assert(r.n_bytes > 0)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, assets)
      .filter($"asset_id" === 0).head()
    assert(again.feature.toSeq == r.feature.toSeq)
  }

  test("resize transform updates image metadata, leaves other media alone") {
    val docs = Tables.documents(spark, sf0001).limit(60)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val resized = Multimodal.transformAssets(spark, assets,
      () => new Multimodal.StubResize(16, 16)).cache()
    assert(resized.count() == assets.count())
    val images = resized.filter($"media_type" === "image").collect()
    assert(images.nonEmpty)
    assert(images.forall(a => a.width.contains(16) && a.height.contains(16)))
    // deterministic + payload shrinks (or stays) under downsampling
    val origSizes = assets.filter($"media_type" === "image")
      .collect().map(a => a.asset_id -> a.content.length).toMap
    assert(images.forall(a => a.content.length <= origSizes(a.asset_id)))
    val av = resized.filter($"media_type" =!= "image").collect()
    val origAv = assets.filter($"media_type" =!= "image").collect()
      .map(a => a.asset_id -> a.content.toSeq).toMap
    assert(av.forall(a => a.content.toSeq == origAv(a.asset_id)))
  }

  test("frame sampling explodes av assets into n evenly-spaced frames") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val nAv = assets.filter($"media_type" =!= "image").count()
    val frames = Multimodal.sampleFrames(spark, assets, n = 4).cache()
    assert(frames.count() == nAv * 4)
    // frames partition the payload: concatenation reconstructs it
    val one = assets.filter($"media_type" =!= "image").head()
    val parts = frames.filter($"asset_id" === one.asset_id)
      .orderBy($"frame_index").collect()
    assert(parts.map(_.frame_index).toSeq == Seq(0, 1, 2, 3))
    assert(parts.flatMap(_.content).toSeq == one.content.toSeq)
    assert(parts.map(_.ts_ms).toSeq == parts.map(_.ts_ms).toSeq.sorted)
  }

  test("binary payloads round-trip through parquet (BinaryType IO)") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val assets = Multimodal.syntheticAssets(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
      .resolve("assets").toString
    assets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // features over the re-read binary column match the direct path
    val f1 = Multimodal.extractFeatures(spark,
      back.as[Multimodal.Asset]).collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, assets)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
  }

  test("media types partition as declared") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    val byType = Multimodal.syntheticAssets(spark, docs)
      .groupByKey(_.media_type).count().collect().toMap
    assert(byType.keySet == Set("image", "audio", "video"))
  }

  test("real ImageIO decode recovers planted PNG stats exactly") {
    // the q108 contract in miniature: encode with the JDK, decode with
    // the JDK, and every stat must equal the plant arithmetic
    val bytes = Multimodal.ImageCodec.encodePng(5, 3, 200)
    assert(Multimodal.ImageCodec.decodeStats(bytes)
      === Some((5, 3, 1, 200.0)))
    val docs = Tables.documents(spark, sf0001).filter($"doc_id" < 120)
    val assets = Multimodal.plantedImages(spark, docs)
    val stats = Multimodal.decodeImageStats(spark, assets).collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      val id = s.asset_id
      if (id % 37 == 0) {
        assert(s.width.isEmpty && s.height.isEmpty &&
          s.bands.isEmpty && s.mean_luma.isEmpty,
          s"truncated asset $id must decode to nulls")
      } else {
        assert(s.width.contains(1 + (id % 7).toInt), s"width of $id")
        assert(s.height.contains(1 + (id % 5).toInt), s"height of $id")
        assert(s.bands.contains(1))
        assert(s.mean_luma.contains(((id * 17) % 256).toDouble),
          s"mean_luma of $id: ${s.mean_luma}")
      }
    }
  }

  test("corrupt bytes decode to nulls, never task failure") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.Asset(1L, "image", Array[Byte](1, 2, 3), None, None, None, None),
      Multimodal.Asset(2L, "image", null, None, None, None, None),
      Multimodal.Asset(3L, "image", Array.emptyByteArray, None, None, None, None),
      Multimodal.Asset(4L, "audio", Array[Byte](9), None, None, Some(10L), None)
    ).toDS()
    val stats = Multimodal.decodeImageStats(spark, junk).collect()
    assert(stats.length == 4)
    assert(stats.forall(s => s.width.isEmpty && s.mean_luma.isEmpty))
  }

  test("ImageIoDecoder plugs into the Decoder seam") {
    import spark.implicits._
    val good = Multimodal.ImageCodec.encodePng(4, 2, 16)
    val assets = Seq(
      Multimodal.Asset(1L, "image", good, None, None, None, None),
      Multimodal.Asset(2L, "image", Array[Byte](0, 1), None, None, None, None),
      Multimodal.Asset(3L, "audio", Array[Byte](1, 2, 3, 4), None, None, Some(5L), None)
    ).toDS()
    val feats = Multimodal.extractFeatures(spark, assets,
        () => new Multimodal.ImageIoDecoder)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats(1L).feature.toSeq == Seq(4f, 2f, 1f, 16f))
    assert(feats(1L).n_bytes == good.length.toLong)
    assert(feats(2L).feature.isEmpty, "corrupt image: empty features")
    // audio falls back to the deterministic byte-fold (8-dim)
    assert(feats(3L).feature.length == 8)
  }

  // ---- perceptual dHash ----

  /** Independent closed-form replay of the planted-fixture hash (the
    * same arithmetic the q113 SQL oracle runs): cell values from the
    * plant formula, bit = right-neighbor greater.
    */
  private def plantedHashRef(id: Long): Long = {
    val g = (id % 25).toInt
    val bump = id % 11 == 0
    def v(i: Int, j: Int): Int =
      (31 * g + 17 * i + 29 * j + 23 * ((g * (i + 2 * j)) % 13)) % 150 +
        (if (bump && i == 4 && j == 0) 50 else 0)
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (v(i + 1, j) > v(i, j)) hash |= 1L << (j * 8 + i)
    hash
  }

  test("dHash of a decoded planted PNG equals the closed-form hash") {
    val docs = Seq(0L, 1L, 11L, 25L, 26L, 37L, 123L, 299L).toDF("doc_id")
    val got = Multimodal.imageDHashes(spark,
        Multimodal.plantedHashImages(spark, docs))
      .as[(Long, Option[Long])].collect().toMap
    docs.as[Long].collect().foreach { id =>
      assert(got(id).contains(plantedHashRef(id)),
        s"doc $id: decode-path hash ${got(id)} != ref ${plantedHashRef(id)}")
    }
  }

  test("dHash is exposure-invariant and gradient-sensitive") {
    val C = Multimodal.ImageCodec
    def pat(x: Int, y: Int): Int = (x * 7 + (x * y) % 5 * 13) % 140
    val base = C.dHash64(C.encodeGrayPng(18, 16, pat)).get
    // uniform brightness shift: every gradient sign unchanged
    val brighter = C.dHash64(C.encodeGrayPng(18, 16, (x, y) => pat(x, y) + 60)).get
    assert(brighter == base, "uniform exposure shift must not move the hash")
    // mirrored image reverses the gradient signs: far in Hamming space
    val mirrored = C.dHash64(C.encodeGrayPng(18, 16, (x, y) => pat(17 - x, y))).get
    assert(java.lang.Long.bitCount(base ^ mirrored) > 16,
      "mirror must scatter the hash")
    // solid gray has no gradients at all
    assert(C.dHash64(C.encodePng(18, 16, 77)).contains(0L))
  }

  test("dHash rejects undecodable and sub-grid payloads as None") {
    val C = Multimodal.ImageCodec
    assert(C.dHash64(null).isEmpty)
    assert(C.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(C.dHash64(C.encodePng(4, 4, 10)).isEmpty, "smaller than the 9x8 grid")
    val truncated = java.util.Arrays.copyOf(C.encodePng(18, 16, 10), 8)
    assert(C.dHash64(truncated).isEmpty)
  }

  test("banded image near-dup pairs are complete vs brute force at Hamming <= 3") {
    val docs = spark.range(120).toDF("doc_id")
    val hashes = Multimodal.imageDHashes(spark,
      Multimodal.plantedHashImages(spark, docs)).cache()
    val got = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val hs = hashes.as[(Long, Option[Long])].collect()
      .map { case (id, h) => id -> h.get }
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(want.exists(_._3 == 0), "planted exact dups must exist")
    assert(want.exists(p => p._3 > 0 && p._3 <= 2),
      "planted bump near-dups must exist")
  }

  test("animated-GIF frames round-trip exactly, incl. non-solid pixels") {
    val C = Multimodal.ImageCodec
    // solid frames: exact shades back, in frame order
    val solid = C.encodeGrayGifFrames(4, 3,
      Seq((_, _) => 77, (_, _) => 108, (_, _) => 199))
    assert(C.decodeFrameStats(solid) ==
      Seq((0, 4, 3, 77.0), (1, 4, 3, 108.0), (2, 4, 3, 199.0)))
    // gradient frame: per-pixel fidelity, not just the mean of a
    // constant — expected mean computed independently
    val grad = C.encodeGrayGifFrames(5, 4, Seq((x, y) => 10 * x + 7 * y))
    val want = (for (y <- 0 until 4; x <- 0 until 5) yield 10 * x + 7 * y)
      .sum.toDouble / 20
    val got = C.decodeFrameStats(grad)
    assert(got.size == 1 && got.head._4 == want)
    // corrupt payloads (even ones keeping the GIF magic) → zero rows
    assert(C.decodeFrameStats(java.util.Arrays.copyOf(solid, 8)).isEmpty)
    assert(C.decodeFrameStats("not a gif".getBytes).isEmpty)
    assert(C.decodeFrameStats(Array.emptyByteArray).isEmpty)
  }

  test("distributed multi-frame decode: planted gifs explode to exact frame rows") {
    val docs = spark.range(80).toDF("doc_id")
    val rows = Multimodal.decodeVideoFrameStats(spark,
      Multimodal.plantedGifs(spark, docs)).cache()
    // corrupt (every 37th) assets contribute zero rows; others nf each
    val perAsset = rows.groupBy($"asset_id").count()
      .as[(Long, Long)].collect().toMap
    (0L until 80L).foreach { id =>
      if (id % 37 == 0) assert(!perAsset.contains(id))
      else assert(perAsset(id) == 2 + id % 4, s"doc $id")
    }
    // every frame row matches the plant formula exactly
    import org.apache.spark.sql.functions.lit
    val bad = rows.filter(
      $"width" =!= lit(3) + $"asset_id" % 4 ||
        $"height" =!= lit(2) + $"asset_id" % 3 ||
        $"mean_luma" =!= (($"asset_id" * 13 + $"frame_index" * 31) % 200)
          .cast("double")).count()
    assert(bad == 0)
  }
}
