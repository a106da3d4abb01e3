package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llmops.Freq

/** Continuous corpus summaries over a document stream: per-micro-batch
  * Misra-Gries heavy-hitters and KMV distinct sketches, merged across
  * batches into a running summary — "top domains/templates so far" and
  * "overlap with a reference corpus so far" as streaming answers.
  *
  * Why foreachBatch + driver-side merge, not a stateful streaming agg:
  * mergeability is the defining property of both constructions
  * (Agarwal et al. 2012; Bar-Yossef et al. 2002), so the correct
  * streaming shape is one bounded aggregation row per micro-batch
  * (≤ k counters + ≤ k longs — the batch's exchange is already
  * partitions·k regardless of batch size) folded into ≤ 2k entries of
  * driver state with the aggregates' own merge rules. A
  * `mapGroupsWithState` formulation would carry the same ≤ 2k entries
  * as store state but serialize them through the state store every
  * batch and pin the output to update-mode semantics; the fold keeps
  * the summary queryable at any moment between batches, with the same
  * guarantees over the union of everything ingested
  * (SketchStreamsSpec pins streamed ≡ batch-over-union).
  */
object SketchStreams {

  /** One immutable fold state — published as a single volatile write
    * per batch so a concurrent reader can never observe a torn summary
    * (e.g. `n` from batch i+1 paired with `freq` from batch i, which
    * would make [[CorpusSummary.errorBound]]/[[CorpusSummary.jaccardVs]]
    * momentarily inconsistent).
    */
  final case class SummaryState(freq: Seq[(String, Long)],
                                kmv: Seq[Long], n: Long)

  /** Running summary of everything ingested so far. Mutated only by
    * the stream's micro-batch thread; the whole (freq, kmv, n) triple
    * is replaced in one volatile write, so a concurrent reader
    * (metrics poller, test assertion) always sees one consistent fold.
    */
  final class CorpusSummary(val k: Int) extends Serializable {
    @volatile private var state: SummaryState = SummaryState(Nil, Nil, 0L)

    /** The latest consistent fold — read once and destructure when
      * several fields must agree.
      */
    def snapshot: SummaryState = state
    def freq: Seq[(String, Long)] = state.freq
    def kmv: Seq[Long] = state.kmv
    def n: Long = state.n

    /** Fold one micro-batch's (MG summary, KMV sketch, count) in with
      * the mergeable-summaries rules; single volatile publish.
      */
    private[streaming] def ingest(bf: Seq[(String, Long)], bs: Seq[Long],
                                  bn: Long): Unit = {
      val s = state
      state = SummaryState(
        Freq.mergeFreqSummaries(s.freq, bf, k),
        Freq.mergeKmvSketches(s.kmv, bs, k),
        s.n + bn)
    }

    /** MG undercount bound for the stream so far: any item with true
      * count > bound is guaranteed present in [[freq]], and every
      * estimate e satisfies true − bound ≤ e ≤ true.
      */
    def errorBound: Double = n.toDouble / (k + 1)

    /** Estimated Jaccard overlap between everything ingested and a
      * reference-corpus sketch (same k) — the streaming contamination
      * number q107 computes in batch.
      */
    def jaccardVs(reference: Seq[Long]): Double =
      Freq.kmvJaccardValue(kmv, reference, k)
  }

  /** Build the tracking writer: each micro-batch contributes ONE
    * bounded row (its MG summary, its KMV sketch, its item count),
    * folded into `summary` with the mergeable-summaries rules, then
    * `onBatch(summary, batchId)` fires for reporting/alerting. Call
    * `.start()` (after checkpoint/trigger options) to begin. Returns
    * the live summary object alongside the writer.
    *
    * `item` feeds the heavy-hitters summary (e.g. a domain or
    * template column); `hash` feeds the distinct sketch (pre-hash
    * with `xxhash64(...)` like the batch q107 contract).
    */
  def summarize(docs: DataFrame, item: Column, hash: Column, k: Int)
               (onBatch: (CorpusSummary, Long) => Unit = (_, _) => ())
      : (CorpusSummary, DataStreamWriter[Row]) = {
    val summary = new CorpusSummary(k)
    val writer = docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val row = batch.agg(
          Freq.freqItems(item, k).as("f"),
          Freq.kmvSketch(hash, k).as("s"),
          count(item).as("n")).head()
        val bf = row.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
        val bs = row.getSeq[Long](1)
        summary.ingest(bf, bs, row.getLong(2))
        onBatch(summary, batchId)
    }
    (summary, writer)
  }

  /** Running EXACT content digest of everything ingested so far
    * (SURVEY §2.10 X132) — the streaming twin of
    * [[graft.ops.Profiling.contentDigest]]: each micro-batch digests
    * alone (≤ nBuckets slim rows cross the batch's one exchange,
    * regardless of batch size) and folds into driver state with the
    * X131 monoid rules (counts and sums add, XORs xor). Unlike the
    * sketches above this summary is exact, so the fold over any batch
    * split equals the batch digest of the union bit-for-bit — a
    * landed corpus stays continuously verifiable against its producer
    * while the ingest is still running. State: ≤ nBuckets map
    * entries, published as one volatile write per batch.
    */
  final class RunningDigest(val nBuckets: Int) extends Serializable {
    @volatile private var state: Map[Long, (Long, Long, Long)] = Map.empty
    @volatile private var lastBatch: Long = -1L

    /** (bucket → (n_rows, xor48, sum32)) of everything so far. */
    def snapshot: Map[Long, (Long, Long, Long)] = state

    /** Folds one micro-batch. foreachBatch is AT-LEAST-ONCE: a
      * checkpoint restart re-delivers the last uncommitted batch with
      * the SAME batchId, and replaying an exact fold would double the
      * count/sum lanes and cancel the XOR lane — so replays (batchId
      * <= the last folded id) are skipped, which is what keeps the
      * bit-for-bit equality with the batch digest true under the
      * standard streaming failure model.
      */
    private[streaming] def ingest(batchId: Long,
                                  rows: Seq[(Long, Long, Long, Long)])
        : Unit = {
      if (batchId <= lastBatch) return
      val s = state
      val merged = rows.foldLeft(s) { case (acc, (b, n, x, sm)) =>
        val (n0, x0, s0) = acc.getOrElse(b, (0L, 0L, 0L))
        acc.updated(b, (n0 + n, x0 ^ x, s0 + sm))
      }
      state = merged
      lastBatch = batchId
    }
  }

  /** Per-micro-batch digest fold over a document stream. The returned
    * digest's snapshot equals `Profiling.contentDigest` of the union
    * of all ingested batches (SketchStreamsSpec pins it).
    */
  def digestStream(docs: DataFrame, cols: Seq[String],
                   nBuckets: Int = 256)
                  (onBatch: (RunningDigest, Long) => Unit = (_, _) => ())
      : (RunningDigest, DataStreamWriter[Row]) = {
    val digest = new RunningDigest(nBuckets)
    val writer = docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val rows = graft.ops.Profiling.contentDigest(batch, cols, nBuckets)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSeq
        digest.ingest(batchId, rows)
        onBatch(digest, batchId)
    }
    (digest, writer)
  }

  /** Running t-digest of a numeric column over everything ingested so
    * far — the rank tier's streaming fold (the batch aggregate is
    * [[graft.llmops.Quantiles.tdigestAgg]], q175): each micro-batch
    * contributes ONE bounded centroid row (≤ O(δ) pairs cross the
    * batch's exchange regardless of batch size), folded with the
    * t-digest merge rule. "What is the p99 document length of the
    * corpus so far" as a streaming answer. Replays are skipped by
    * batchId like [[RunningDigest]] — a re-delivered batch would
    * double its mass in the fold.
    */
  final class RunningQuantiles(val compression: Int) extends Serializable {
    @volatile private var state: Seq[(Double, Double)] = Nil
    @volatile private var lastBatch: Long = -1L

    /** Centroids (mean, weight) ascending by mean, of everything so far. */
    def snapshot: Seq[(Double, Double)] = state
    /** Total folded weight (= non-null rows ingested). */
    def n: Double = state.map(_._2).sum
    /** Interpolated quantile of the stream so far; NaN before data. */
    def quantile(q: Double): Double =
      graft.llmops.Quantiles.tdigestQuantileValue(state, q)

    private[streaming] def ingest(batchId: Long,
                                  batch: Seq[(Double, Double)]): Unit = {
      if (batchId <= lastBatch) return
      state = graft.llmops.Quantiles.mergeTDigests(state, batch, compression)
      lastBatch = batchId
    }
  }

  /** Per-micro-batch t-digest fold over a stream; the returned
    * summary's quantiles carry the union's rank guarantee
    * (SketchStreamsSpec pins the contract vs the batch union).
    */
  def quantileStream(docs: DataFrame, value: Column, compression: Int = 100)
                    (onBatch: (RunningQuantiles, Long) => Unit = (_, _) => ())
      : (RunningQuantiles, DataStreamWriter[Row]) = {
    val rq = new RunningQuantiles(compression)
    val writer = docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val row = batch.agg(
          graft.llmops.Quantiles.tdigestAgg(value, compression).as("d")).head()
        val cents = row.getSeq[Row](0).map(r => (r.getDouble(0), r.getDouble(1)))
        rq.ingest(batchId, cents)
        onBatch(rq, batchId)
    }
    (rq, writer)
  }
}
