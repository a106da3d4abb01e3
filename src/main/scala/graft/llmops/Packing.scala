package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in
  * a deterministic order and chunked into fixed token windows
  * ("concat-and-chunk" packing), so every training sequence is full and
  * no padding is wasted. The operator assigns each document the bin its
  * first token lands in.
  *
  * Scale shape: ONE window pass. The stream key
  * (`group, doc_id % streams`) splits each group's running
  * concatenation into `streams` independent sub-streams, so the window
  * parallelism is a knob independent of group cardinality — at 100 TB a
  * single per-group cumulative sum would funnel a whole group through
  * one task; with streams = O(cluster cores) each task sees
  * |group|/streams documents. The assignment is a pure function of
  * (doc_id, token counts), so reruns and incremental appends with
  * monotone ids are stable, and the whole thing mirrors exactly in
  * ANSI SQL (window SUM + floor division) for the oracle.
  */
object Packing {

  /** Assign each doc the packing bin where its first token lands.
    * Output: input columns + (stream, n_tokens, bin_id).
    */
  def packBins(docs: DataFrame, targetTokens: Int, streams: Int = 8,
               idCol: String = "doc_id", textCol: String = "text",
               groupCol: String = "source"): DataFrame = {
    require(targetTokens > 0 && streams > 0)
    val w = Window
      .partitionBy(col(groupCol), col("stream"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("stream", pmod(col(idCol), lit(streams)))
      .withColumn("n_tokens", TextFuncs.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(targetTokens.toDouble))
          .cast("long"))
      .drop("cum_tokens")
  }

  /** Bin-level stats: docs and tokens per (group, stream, bin). */
  def binStats(packed: DataFrame, groupCol: String = "source"): DataFrame =
    packed.groupBy(col(groupCol), col("stream"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
}
