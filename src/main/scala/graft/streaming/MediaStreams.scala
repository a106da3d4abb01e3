package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llmops.{Audio, Dedup, Multimodal}
import graft.llmops.Multimodal.Asset

/** Streaming near-duplicate gating for the media tier — the
  * [[DocStreams]] story for images and audio. A continuous asset
  * stream is fingerprinted per micro-batch with the REAL codecs
  * (perceptual dHash for images, energy hash for audio), checked
  * against a persisted fingerprint table with the same banded Hamming
  * join the batch near-dup path uses, and only genuinely new assets'
  * fingerprints are appended.
  *
  * State is the fingerprint table itself: 16 bytes per admitted asset
  * (id, 64-bit hash) in plain parquet — payloads never accumulate
  * anywhere, never reach the driver, and the table doubles as the
  * batch-side fingerprint corpus ([[Multimodal.imageNearDupPairs]]
  * consumes the same shape). Guarantees carry over unchanged from the
  * batch operators: the 4×16-bit banding is COMPLETE for Hamming ≤ 3
  * (pigeonhole), so an incoming near-dup of anything already admitted
  * cannot slip through, across any number of micro-batches
  * (MediaStreamsSpec pins streamed ≡ batch-over-union).
  *
  * Per batch, in order:
  *  1. fingerprint the batch (distributed decode, [[Multimodal
  *     .imageDHashes]] / [[Audio.audioEnergyHashes]]);
  *  2. drop batch assets within `maxHamming` of the persisted table
  *     ([[Dedup.bandedHammingPairsAB]] — work is |collisions|, the
  *     table side's hot buckets capped);
  *  3. near-dup dedup WITHIN the batch (keep the lowest id,
  *     [[Dedup.bandedHammingPairs]]);
  *  4. append survivors' (id, fp) to the table.
  *
  * Undecodable payloads (null fingerprint) pass the gate — absence of
  * evidence, the [[graft.llmops.Corpus]] LM-gate convention — but are
  * NOT admitted to the table (nothing to match against later).
  */
object MediaStreams {

  /** Read the persisted fingerprint table, or an empty (id, fp) frame
    * before the first batch ever commits.
    */
  def fingerprintTable(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path).select(col("id"), col("fp"))
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        import spark.implicits._
        spark.emptyDataset[(Long, Long)].toDF("id", "fp")
    }

  /** One micro-batch of the gate over an already-fingerprinted frame
    * `fps` = (id, fp nullable): returns the admitted (id, fp) rows and
    * appends them to `tablePath`. Exposed batch-shaped so the spec —
    * and a batch backfill — can run the EXACT per-batch transition.
    */
  def admitBatch(spark: SparkSession, fps: DataFrame, tablePath: String,
                 maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    val hashed = fps.filter(col("fp").isNotNull)
    val corpus = fingerprintTable(spark, tablePath)
    val vsCorpus = Dedup.bandedHammingPairsAB(corpus, hashed,
        maxHamming, maxBucket)
      .select(col("id_b").as("id")).distinct()
    val fresh = hashed.join(vsCorpus, Seq("id"), "left_anti")
    val within = Dedup.bandedHammingPairs(fresh, maxHamming, maxBucket)
      .select(col("id_b").as("id")).distinct()
    val survivors = fresh.join(within, Seq("id"), "left_anti")
      .select(col("id"), col("fp"))
      // the result feeds the parquet append AND the caller's return —
      // recomputing would re-run both Hamming joins (and on a real
      // cluster re-read the table mid-append)
      .localCheckpoint()
    survivors.write.mode("append").parquet(tablePath)
    survivors
  }

  /** The streaming writer over ANY fingerprint function — call
    * `.start()` (after checkpoint/trigger options) to begin.
    * `fingerprint` maps an asset micro-batch to (id, fp nullable);
    * `onBatch(batchId, admitted)` fires after each append for
    * reporting (admitted counts, alerting).
    */
  def nearDupIngest(assets: Dataset[Asset], tablePath: String,
                    fingerprint: Dataset[Asset] => DataFrame,
                    maxHamming: Int = 3, maxBucket: Int = 200)
                   (onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Asset] =
    assets.writeStream.foreachBatch {
      (batch: Dataset[Asset], batchId: Long) =>
        val admitted = admitBatch(batch.sparkSession, fingerprint(batch),
          tablePath, maxHamming, maxBucket)
        onBatch(batchId, admitted.count())
    }

  /** Image ingest: REAL perceptual dHash fingerprints
    * ([[Multimodal.imageDHashes]] — javax.imageio decode per
    * partition), gated at the LAION-style Hamming ≤ 3 default.
    */
  def imageIngest(assets: Dataset[Asset], tablePath: String,
                  maxHamming: Int = 3, maxBucket: Int = 200)
                 (onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Asset] =
    nearDupIngest(assets, tablePath,
      b => Multimodal.imageDHashes(b.sparkSession, b)
        .select(col("asset_id").as("id"), col("dhash").as("fp")),
      maxHamming, maxBucket)(onBatch)

  /** Audio ingest: REAL energy-hash fingerprints
    * ([[Audio.audioEnergyHashes]] — WAV/PCM decode per partition),
    * volume-invariant by construction.
    */
  def audioIngest(assets: Dataset[Asset], tablePath: String,
                  maxHamming: Int = 3, maxBucket: Int = 200)
                 (onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Asset] =
    nearDupIngest(assets, tablePath,
      b => Audio.audioEnergyHashes(b.sparkSession, b)
        .select(col("asset_id").as("id"), col("ahash").as("fp")),
      maxHamming, maxBucket)(onBatch)

  /** One micro-batch of the document-text gate: extract text from PDF
    * payloads ([[graft.llmops.Pdf.extractPdfText]] — real parse,
    * corrupt → dropped), quality-gate + PII-redact it with the SAME
    * pass the batch/stream text tiers use ([[DocStreams.cleanDocs]]),
    * exact-dedup against the persisted text table on the widened
    * digest pair ([[DocStreams.dedupDocs]]'s 192-bit key — the state
    * here is digests, never crawled payloads), dedup within the
    * batch, and append surviving (doc_id, text) rows. Batch-shaped
    * for spec/backfill, like [[admitBatch]].
    */
  def admitDocumentBatch(spark: SparkSession, assets: Dataset[Asset],
                         tablePath: String,
                         minQuality: Double = 0.25): DataFrame = {
    import spark.implicits._
    val extracted = graft.llmops.Pdf.extractPdfText(spark, assets).toDF()
      .filter(col("text").isNotNull)
      .select(col("asset_id").as("doc_id"), col("text"))
    val cleaned = DocStreams.cleanDocs(extracted, minQuality)
      .withColumn("__d1", xxhash64(col("text"), length(col("text"))))
      .withColumn("__d2", md5(col("text").cast("binary")))
    val corpus =
      try spark.read.parquet(tablePath).select(
        xxhash64(col("text"), length(col("text"))).as("__d1"),
        md5(col("text").cast("binary")).as("__d2")).distinct()
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.emptyDataset[(Long, String)].toDF("__d1", "__d2")
      }
    val survivors = cleaned
      .join(corpus, Seq("__d1", "__d2"), "left_anti")
      .dropDuplicates("__d1", "__d2")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    survivors.write.mode("append").parquet(tablePath)
    survivors
  }

  /** Streaming crawler-to-corpus path for the reference's actual
    * payload type: a stream of PDF assets becomes a growing table of
    * clean, deduplicated, PII-redacted text. Same shape as
    * [[imageIngest]]; the text table is directly consumable by every
    * batch llmops stage (near-dup LSH, decontamination, training-set
    * assembly).
    */
  def pdfTextIngest(assets: Dataset[Asset], tablePath: String,
                    minQuality: Double = 0.25)
                   (onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Asset] =
    assets.writeStream.foreachBatch {
      (batch: Dataset[Asset], batchId: Long) =>
        val admitted = admitDocumentBatch(batch.sparkSession, batch,
          tablePath, minQuality)
        onBatch(batchId, admitted.count())
    }

  /** The whole crawl-archive→corpus flow as one continuous stream —
    * the q122 composition running against a LANDING directory instead
    * of a fixed fixture: WARC shards appear under `warcDir` (the
    * continuous-crawl delivery pattern), each micro-batch parses the
    * new shards ([[graft.io.Warc.readFilesStream]] — one task per
    * shard, payloads stay in their tasks), keeps the 2xx
    * `application/pdf` responses, and pushes them through the SAME
    * extract→quality-gate→exact-dedup→land transition as
    * [[pdfTextIngest]]. Asset ids key on `xxhash64(target_uri)` so a
    * re-crawled or re-shipped URI is stable across shards and retries;
    * content-level re-arrivals are gated by the digest table exactly
    * as in the fixture-stream path.
    */
  def warcPdfIngest(spark: SparkSession, warcDir: String,
                    tablePath: String, minQuality: Double = 0.25)
                   (onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Asset] = {
    import spark.implicits._
    val assets = graft.io.Warc.readFilesStream(spark, warcDir)
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        col("http_content_type").startsWith("application/pdf") &&
        col("target_uri").isNotNull)
      .select(xxhash64(col("target_uri")).as("id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, content) =>
        Asset(id, "document", content, None, None, None, Some("pdf"))
      }
    pdfTextIngest(assets, tablePath, minQuality)(onBatch)
  }
}
