package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llmops.TextFuncs

/** Streaming ingest for training documents: the batch llmops surface
  * (quality gate, PII scrubbing, dedup, decontamination) recast as a
  * continuous pipeline over a document stream with an `ingest_ts`
  * event-time column. Everything stays state-bounded:
  *
  *  - quality + redaction are narrow maps (stateless);
  *  - dedup keys on a 8-byte content digest and keeps state only
  *    within the watermark horizon (`dropDuplicatesWithinWatermark`);
  *  - decontamination is a stream-static join against a broadcast
  *    digest table of the (small) benchmark corpus — stateless, and
  *    re-planned per micro-batch so a refreshed benchmark snapshot is
  *    picked up without restarting state.
  *
  * Exact-match decontamination only: near-duplicate (LSH) decontam
  * needs a candidate self-join, which is a batch shape — run
  * [[graft.llmops.Dedup.decontaminate]] over the accumulated corpus
  * periodically for that. The same code runs in batch for testing
  * (every operator here is batch-compatible).
  */
object DocStreams {

  /** Quality-gate then PII-redact a document stream (stateless). */
  def cleanDocs(docs: DataFrame, minQuality: Double = 0.25,
                textCol: String = "text"): DataFrame =
    docs
      .filter(TextFuncs.qualityScore(col(textCol)) >= minQuality)
      .withColumn(textCol, TextFuncs.redactPii(col(textCol)))

  /** Drop documents whose content was already seen within the
    * watermark horizon. Streaming state is one ~24-byte digest pair
    * per unique doc in the horizon — never the text.
    *
    * Collision tradeoff: dedup keys on content digests, not on text
    * equality (shuffling/keeping full text in state is exactly what
    * this operator exists to avoid at corpus scale). A digest
    * collision drops a distinct document. With the 8-byte xxhash64
    * alone that risk is real at corpus scale (birthday bound ~2^32
    * docs), so the key is widened with the independent 128-bit md5 —
    * a combined ~192-bit key whose collision probability is
    * negligible at any corpus size, for 16 extra bytes of state.
    */
  def dedupDocs(docs: DataFrame, watermark: String = "10 minutes",
                tsCol: String = "ingest_ts",
                textCol: String = "text"): DataFrame = {
    val keyed = docs
      .withColumn("__digest", xxhash64(col(textCol), length(col(textCol))))
      .withColumn("__digest2", md5(col(textCol).cast("binary")))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__digest", "__digest2")
      else // batch analog: horizonless exact dedup on the same digests
        keyed.dropDuplicates("__digest", "__digest2")
    deduped.drop("__digest", "__digest2")
  }

  /** Remove documents exactly matching a benchmark document:
    * stream-static left join on the content digest (broadcast static
    * side) with a text-equality verify, keep the misses. Stateless.
    *
    * Both sides must be in the SAME normalization: exact matching is
    * literal, so if the stream text was transformed upstream (e.g.
    * PII-redacted by [[cleanDocs]]), apply the same transform to
    * `benchmark` before calling — [[ingest]] does exactly that.
    */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
                          textCol: String = "text"): DataFrame = {
    val bench = benchmark
      .select(xxhash64(col(textCol), length(col(textCol))).as("__bdigest"),
        col(textCol).as("__btext"))
      .distinct()
    docs
      .withColumn("__digest", xxhash64(col(textCol), length(col(textCol))))
      .join(broadcast(bench),
        col("__digest") === col("__bdigest") && col(textCol) === col("__btext"),
        "left_outer")
      .filter(col("__bdigest").isNull)
      .drop("__digest", "__bdigest", "__btext")
  }

  /** Full ingest: clean → sample → dedup-in-horizon → decontaminate.
    * The benchmark text is redacted with the same PII pass
    * [[cleanDocs]] applies to the stream, so a PII-bearing benchmark
    * document still exact-matches its redacted stream counterpart
    * (digesting the raw benchmark text would let exactly those
    * documents escape decontamination).
    *
    * `sampleFrac` downsamples by content hash
    * ([[graft.llmops.Splits.sampleHash]]) — stateless, so it composes
    * into the stream for free, and placed BEFORE dedup so dropped
    * docs never enter dedup state. Content-keyed sampling keeps the
    * decision consistent if the same doc re-arrives in a later
    * micro-batch.
    *
    * `dsir` gates on a DSIR importance log-weight floor
    * ((ratioMap, default, minLogw) — see
    * [[graft.llmops.Dsir.ratioMap]]): the model rides as a map
    * literal in a pure projection ([[graft.llmops.Dsir.logwColumn]]),
    * so the gate is append-mode legal with zero state — the
    * streaming analog of the q100 batch selection. It runs on RAW
    * text (before redaction), matching the batch side where ratios
    * are fit on raw text.
    *
    * `normalizeUnicode` mirrors [[graft.llmops.Corpus.clean]]'s stage
    * 0: NFC + control/whitespace scrub FIRST (a stateless projection,
    * append-mode legal), so byte-spelling variants of one document
    * collapse in the streaming dedup horizon exactly as they do in
    * the batch path.
    */
  def ingest(docs: DataFrame, benchmark: DataFrame,
             minQuality: Double = 0.25,
             watermark: String = "10 minutes",
             tsCol: String = "ingest_ts",
             textCol: String = "text",
             sampleFrac: Double = 1.0,
             dsir: Option[(Map[String, Double], Double, Double)] = None,
             normalizeUnicode: Boolean = false)
      : DataFrame = {
    val S = graft.llmops.Splits
    // per-line clean, lines rejoined — the same line-structure-
    // preserving form as Corpus.clean's stage 0
    val canonical =
      if (normalizeUnicode)
        docs.withColumn(textCol, array_join(
          transform(
            split(graft.expr.NormFuncs.nfc_norm(col(textCol)), "\n"),
            l => graft.expr.NormFuncs.clean_text(l)),
          "\n"))
      else docs
    val dsirGated = dsir.fold(canonical) { case (ratios, dflt, minLogw) =>
      canonical.filter(
        graft.llmops.Dsir.logwColumn(col(textCol), ratios, dflt) >= minLogw)
    }
    val sampled = cleanDocs(dsirGated, minQuality, textCol)
      .filter(S.sampleHash(col(textCol),
        S.stratumThreshold(lit(""), Map.empty, sampleFrac)))
    decontaminateStream(
      dedupDocs(sampled, watermark, tsCol, textCol),
      benchmark.withColumn(textCol, TextFuncs.redactPii(col(textCol))),
      textCol)
  }
}
