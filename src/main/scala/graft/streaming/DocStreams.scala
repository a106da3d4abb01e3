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
    * watermark horizon. Streaming state is one 8-byte digest per
    * unique doc in the horizon — never the text.
    */
  def dedupDocs(docs: DataFrame, watermark: String = "10 minutes",
                tsCol: String = "ingest_ts",
                textCol: String = "text"): DataFrame = {
    val keyed = docs
      .withColumn("__digest", xxhash64(col(textCol), length(col(textCol))))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__digest")
      else // batch analog: horizonless exact dedup on the same digest
        keyed.dropDuplicates("__digest")
    deduped.drop("__digest")
  }

  /** Remove documents exactly matching a benchmark document:
    * stream-static left join on the content digest (broadcast static
    * side) with a text-equality verify, keep the misses. Stateless.
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

  /** Full ingest: clean → dedup-in-horizon → decontaminate. */
  def ingest(docs: DataFrame, benchmark: DataFrame,
             minQuality: Double = 0.25,
             watermark: String = "10 minutes",
             tsCol: String = "ingest_ts",
             textCol: String = "text"): DataFrame =
    decontaminateStream(
      dedupDocs(cleanDocs(docs, minQuality, textCol), watermark, tsCol, textCol),
      benchmark, textCol)
}
