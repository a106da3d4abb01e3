package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (the GPT/LLaMA pretraining layout):
  * concatenate the corpus token stream in a deterministic document
  * order and slice it into fixed-length training sequences, emitting
  * the (sequence, document-fragment) assignment rows a sharded data
  * loader consumes. Packing wastes no tokens on padding — every
  * sequence is exactly `seqLen` tokens (the final one excepted) and a
  * document that straddles a boundary simply continues in the next
  * sequence.
  *
  * The only genuinely global construct here is the exclusive prefix
  * sum of token counts in document order — naively a
  * `Window.orderBy(id)` over the whole corpus, i.e. a single-partition
  * sort: the classic scale-killer. This implementation makes it
  * scalable the standard way:
  *
  *  1. bucket documents by id RANGE (boundaries = approx quantiles of
  *     the id column — driver-bounded; boundary placement affects
  *     only parallelism, never results),
  *  2. one tiny aggregation computes per-bucket token subtotals
  *     (≤ `buckets` rows to the driver), prefix-summed into bucket
  *     offsets and broadcast back as a literal map,
  *  3. the window runs `partitionBy(bucket)` — each partition sorts
  *     only its own slice, plus a map-literal lookup for the offset.
  *
  * So the exchange is one slim (id, n_tok) shuffle into range
  * buckets; no stage ever sees the corpus in one task. Document ids
  * must be unique (they define the canonical stream order).
  *
  * Reference-analog note: the reference pipeline stops at storing
  * parsed documents (`/root/reference/README.md:17` — download,
  * Docling-parse, store); sequence packing is part of this library's
  * training-data extension brief — the layout step between a cleaned
  * corpus and a trainer's data loader, with no reference counterpart.
  */
object Packing {

  /** Exact floor(c / d) for non-negative long columns without a
    * double-precision hazard: c − (c mod d) is an exact multiple of
    * d, so the one double division is exact for quotients < 2⁵³
    * (~9·10¹⁵ sequences — far past any corpus).
    */
  private[llmops] def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** (id, n_toks, stream_start) — each kept document's exclusive
    * prefix sum of `ntokCol` in ascending `idCol` order, i.e. its
    * first token's offset in the concatenated corpus stream.
    * Zero-token documents are dropped (they occupy no stream span).
    */
  def tokenOffsets(docs: DataFrame, idCol: String = "doc_id",
                   ntokCol: String = "n_toks",
                   buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val slim = docs.select(col(idCol).cast("long").as("id"),
        col(ntokCol).cast("long").as("n_toks"))
      .filter(col("n_toks") >= 1)
    val cuts =
      if (buckets == 1) Array.empty[Double]
      else slim.stat.approxQuantile("id",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    val bucket =
      if (cuts.isEmpty) lit(0)
      else size(filter(typedLit(cuts), b => col("id").cast("double") >= b))
    val withB = slim.withColumn("__b", bucket)
    // per-bucket subtotals -> exclusive prefix offsets (driver-bounded)
    val subtotals = withB.groupBy("__b").agg(sum("n_toks").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = subtotals.scanLeft((0, 0L)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }.sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__b")), lit(0L))
    val w = Window.partitionBy("__b").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.select(col("id"), col("n_toks"),
      (coalesce(sum(col("n_toks")).over(w), lit(0L)) + offCol)
        .as("stream_start"))
  }

  /** Fragment assignment rows: for sequence length `seqLen`, document
    * `id` spanning stream tokens [start, start+n) yields one row per
    * overlapped sequence ⌊start/L⌋ … ⌊(start+n−1)/L⌋ with
    *  - `doc_offset`: first token of the fragment within the document,
    *  - `seq_offset`: its position within the sequence,
    *  - `n_toks`: fragment length.
    * Fragments tile every sequence exactly (no gaps, no padding) and
    * every document completely — invariants PackingSpec pins. The
    * per-doc explode is bounded by n/L + 1 rows, so long documents
    * fan out proportionally to their length, never quadratically.
    */
  def packSequences(docs: DataFrame, seqLen: Int,
                    idCol: String = "doc_id", ntokCol: String = "n_toks",
                    buckets: Int = 64): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val L = seqLen.toLong
    tokenOffsets(docs, idCol, ntokCol, buckets)
      .select(col("id"), col("n_toks"), col("stream_start").as("st"))
      .select(col("id"), col("n_toks"), col("st"),
        explode(sequence(floorDiv(col("st"), L),
          floorDiv(col("st") + col("n_toks") - 1, L))).as("seq_id"))
      .select(col("seq_id"), col("id"),
        greatest(col("seq_id") * L - col("st"), lit(0L)).as("doc_offset"),
        greatest(col("st") - col("seq_id") * L, lit(0L)).as("seq_offset"),
        (least(col("st") + col("n_toks"), (col("seq_id") + 1) * L) -
          greatest(col("st"), col("seq_id") * L)).as("n_toks"))
  }

  /** Per-sequence packing stats over [[packSequences]] output:
    * document count, token fill (= seqLen everywhere but the tail),
    * and how many tokens sit at a document boundary's sequence-start
    * (the attention-reset positions a doc-masked trainer needs).
    */
  def sequenceStats(fragments: DataFrame): DataFrame =
    fragments.groupBy("seq_id").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_toks"),
      sum(when(col("doc_offset") === 0, 1L).otherwise(0L))
        .as("n_doc_starts"))

  // --- coarse stream-sharded binning (the earlier, cheaper tier) ---
  //
  // [[packBins]] predates [[packSequences]] and answers a weaker
  // question — "which bin does each document START in?" — with an
  // even cheaper plan: the (group, doc_id % streams) key makes every
  // cumulative sum a window over 1/streams of a group, no cross-
  // stream offset pass at all, at the cost of `streams` independent
  // token streams (fine for shuffle-and-mix planning, not for exact
  // loader layout). packSequences is the exact-tiling upgrade: one
  // global stream, boundary-straddling fragments, zero padding.

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
