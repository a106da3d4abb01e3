package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (SURVEY §2.9). The reference is strictly batch (weekly Airflow
  * cron, README.md:171-177); these operators make the engine
  * capability-complete for the streaming half of the contract. Each
  * transform takes a DataFrame so the same code runs in batch tests
  * (via the parquet table) and on `readStream` sources.
  */
object EventStreams {

  /** Tumbling-window counts with a watermark: the canonical
    * late-data-tolerant aggregation. On a stream: append-mode safe.
    */
  def hourlyCounts(events: DataFrame,
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-window PSI drift against a static reference (X216) — the
    * streaming twin of [[graft.llmops.Binning.psiReport]]: bin each
    * event's `value` by the REFERENCE's edges (a broadcast-literal
    * when-chain, computed offline by the batch operator), aggregate
    * per event-time window with one conditional-sum per bin (ONE
    * stateful operator — no chained aggregation, so plain append
    * mode), and close the PSI arithmetic in the projection. State per
    * window is `bins` longs — constant, not row-proportional. The
    * monitoring loop this serves: batch fits edges+proportions on the
    * reference corpus, the stream scores every window of live traffic
    * against them, windows crossing 0.25 page a human.
    *
    * Same code path runs in batch (`events.isStreaming` gates only
    * the watermark), which is what the spec pins against the batch
    * kernel.
    *
    * @param edges    ascending bin edges from the reference (the
    *                 batch operator's 6dp convention)
    * @param refProps reference proportions, one per bin
    *                 (edges.size + 1 entries, summing to ~1)
    * @return (window_start, n, psi) — psi 4dp with the batch
    *         operator's 1e-6 clamped-log convention; empty-reference
    *         bins therefore contribute loudly, as they should
    */
  def psiWindows(events: DataFrame, edges: Seq[Double],
                 refProps: Seq[Double], windowLen: String = "1 hour",
                 watermark: String = "10 minutes"): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted,
      "edges must be non-empty ascending")
    require(refProps.length == edges.length + 1,
      s"need ${edges.length + 1} reference proportions, " +
        s"got ${refProps.length}")
    require(math.abs(refProps.sum - 1.0) < 1e-6,
      "reference proportions must sum to 1")
    val bins = refProps.length
    val eps = 1e-6
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    val bin = edges.map(e => when(col("value") > e, 1).otherwise(0))
      .reduce(_ + _)
    val counted = src
      .where(col("value").isNotNull)
      .withColumn("__bin", bin)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("n"),
        (0 until bins).map(b =>
          sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"__n$b"))
          : _*)
    val psi = (0 until bins).map { b =>
      val p = col(s"__n$b") / col("n").cast("double")
      (p - refProps(b)) *
        log(greatest(p, lit(eps)) / lit(math.max(refProps(b), eps)))
    }.reduce(_ + _)
    counted.select(col("window.start").as("window_start"), col("n"),
      round(psi, 4).as("psi"))
  }

  /** Sliding-window event rate. */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Per-window top-k events by score (e.g. largest transactions per
    * hour) via the bounded-heap [[graft.llmops.TopK]] aggregate:
    * streaming state per window is ≤k slim entries — constant, not
    * proportional to the window's row count — and the same code runs
    * in batch (q54's oracle pins it against a rank window).
    */
  def windowTopK(events: DataFrame, k: Int,
                 windowLen: String = "1 hour",
                 watermark: String = "10 minutes",
                 idCol: String = "event_id",
                 scoreCol: String = "value"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.llmops.TopK.topK(col(idCol), col(scoreCol), k).as("topk"))
      .select(col("window.start").as("window_start"),
        posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("window_start"), col("t._1").as(idCol),
        col("t._2").as(scoreCol), (col("pos") + 1).cast("int").as("rk"))

  /** Stream-static enrichment: join a live event stream against a
    * static dimension (broadcast — re-planned per micro-batch, so a
    * refreshed dim snapshot is picked up on restart). The streaming
    * analog of J1/J2.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup: drops events whose key was already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` —
    * state is bounded by the watermark instead of growing forever,
    * which is what makes streaming dedup viable on an infinite
    * stream).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class TransitionState(lastType: String, lastUs: Long,
                                   lastId: Long)
  final case class Transition(user_id: Long, prev_type: String,
                              next_type: String, gap_ms: Long)

  /** Streaming counterpart of [[graft.ops.Paths.transitionMatrix]]'s
    * pair extraction (X165): per-user consecutive (prev → next)
    * transitions as they arrive, state = ONE slim last-event row per
    * user. Pairs separated by ≥ `maxGapMillis` are cut exactly as in
    * batch; with a finite gap the state also EXPIRES via event-time
    * timeout once the watermark passes `last + maxGap` — any later
    * pair would be cut anyway, so expiry is semantics-free and keeps
    * state bounded by ACTIVE users, not all users ever seen.
    * Downstream, a running `groupBy(prev, next).count()` is the live
    * transition matrix. Events are ordered (ts, event_id) within each
    * micro-batch (the [[sessionize]] contract: cross-batch
    * out-of-order arrival beyond the watermark is the caller's
    * ingest-ordering responsibility).
    */
  def transitionsStream(events: Dataset[Event],
                        maxGapMillis: Long = Long.MaxValue,
                        watermark: String = "10 minutes")
      : Dataset[Transition] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val bounded = maxGapMillis != Long.MaxValue
    val src =
      if (streaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, Transition](
        OutputMode.Append,
        if (streaming && bounded) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event],
         state: GroupState[TransitionState]) =>
          if (state.hasTimedOut) {
            // idle past watermark + maxGap: any future pair is cut by
            // the gap filter anyway — dropping state changes nothing
            state.remove()
            Iterator.empty
          } else {
            // MICROsecond arithmetic, exactly the batch operator's
            // (tsMicros ordering + gap_us < maxGap·1000 cut) — the
            // events table carries sub-ms precision and the
            // batch ≡ stream pin is exact, not approximate
            def us(e: Event): Long =
              e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            val sorted = it.toSeq.sortBy(e => (us(e), e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = us(e)
              if (st != null &&
                  (!bounded || t - st.lastUs < maxGapMillis * 1000L))
                out += Transition(uid, st.lastType, e.event_type,
                  (t - st.lastUs) / 1000L)
              st = TransitionState(e.event_type, t, e.event_id)
            }
            if (st != null) {
              if (streaming) {
                state.update(st)
                if (bounded) {
                  // guard last + maxGap against Long overflow for
                  // large bounded gaps: an expiry past the epoch
                  // horizon is equivalent to never expiring
                  val lastMs = st.lastUs / 1000L
                  if (lastMs <= Long.MaxValue - maxGapMillis)
                    state.setTimeoutTimestamp(lastMs + maxGapMillis)
                }
              } else state.remove()
            }
            out.iterator
          }
      }
  }

  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Int, total_value: Double)

  /** Session windows via `flatMapGroupsWithState` (SURVEY §2.9 custom
    * state): a session closes after `gapMillis` of user inactivity.
    *
    * Streaming: the open session is persisted via `state.update` and
    * closed by an event-time timeout once the watermark passes
    * `last + gapMillis` — sessions spanning micro-batches merge instead
    * of splitting. Batch: the function runs once per group, timeouts
    * never fire, so the trailing session is emitted directly.
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src =
      if (streaming) events.withWatermark("ts", s"$gapMillis milliseconds")
      else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close it
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.start, st.last, st.n, st.total))
          } else {
            // merge this invocation's events in ts order onto any open
            // session carried over from previous micro-batches
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.last > gapMillis) {
                out += Session(userId, st.start, st.last, st.n, st.total)
                st = SessionState(t, t, 1, e.value)
              } else st = SessionState(st.start, t, st.n + 1, st.total + e.value)
            }
            if (st != null) {
              if (streaming) {
                state.update(st)
                state.setTimeoutTimestamp(st.last + gapMillis)
              } else {
                out += Session(userId, st.start, st.last, st.n, st.total)
                state.remove()
              }
            }
            out.iterator
          }
      }
  }

  final case class AttributionState(touches: Seq[(Long, Long)])
  final case class Attribution(user_id: Long, conversion_event_id: Long,
                               conversion_ms: Long,
                               first_touch_event_id: java.lang.Long,
                               last_touch_event_id: java.lang.Long)

  /** Streaming counterpart of [[graft.ops.Attribution.touches]]
    * (X202): first/last-touch credit emitted AT conversion time. The
    * batch operator answers "who got credit" after the fact; this one
    * answers it while the campaign runs, with identical semantics:
    * touches inside `lookbackMillis` of the conversion (inclusive),
    * (ts, event_id) tie order, conversions with no touch emit null
    * credit. State = the per-user touch buffer PRUNED to the lookback
    * horizon — a touch older than now − lookback can never enter a
    * future in-order conversion's window, so pruning is
    * semantics-free and state is bounded by touch rate × lookback,
    * not history; idle users expire wholesale via event-time timeout
    * (the [[transitionsStream]] contract).
    *
    * Documented divergence from batch: the batch RANGE frame is
    * VALUE-based, so a touch sharing the conversion's millisecond but
    * ordered after it by event_id still gets credit there; the stream
    * processes in (ts, id) arrival order and cannot see it.
    * Sub-millisecond simultaneity is the caller's granularity
    * responsibility. Cross-batch out-of-order arrival beyond the
    * watermark: the [[sessionize]] ingest-ordering contract.
    */
  def attributionStream(events: Dataset[Event], touchTypes: Seq[String],
                        conversionType: String, lookbackMillis: Long,
                        watermark: String = "10 minutes")
      : Dataset[Attribution] = {
    require(touchTypes.nonEmpty && lookbackMillis > 0,
      "touchTypes non-empty, lookbackMillis positive")
    // the twins' contract (see Attribution.touches): with an
    // overlapping type the batch RANGE frame would include the
    // conversion row itself while this stream appends the touch
    // AFTER emitting the conversion — forbid rather than diverge
    require(!touchTypes.contains(conversionType),
      s"conversionType '$conversionType' must not also be a touch type")
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val touches = touchTypes.toSet
    val lbUs = lookbackMillis * 1000L
    val src =
      if (streaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttributionState, Attribution](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event],
         state: GroupState[AttributionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def us(e: Event): Long =
              e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            val sorted = it.toSeq.sortBy(e => (us(e), e.event_id))
            val out =
              scala.collection.mutable.ArrayBuffer.empty[Attribution]
            var buf = state.getOption.map(_.touches.toVector)
              .getOrElse(Vector.empty)
            for (e <- sorted) {
              val t = us(e)
              // in-order contract: touches strictly older than the
              // horizon can never be credited again
              buf = buf.dropWhile(_._1 < t - lbUs)
              if (e.event_type == conversionType) {
                out += Attribution(uid, e.event_id, t / 1000L,
                  buf.headOption.map(p => java.lang.Long.valueOf(p._2))
                    .orNull,
                  buf.lastOption.map(p => java.lang.Long.valueOf(p._2))
                    .orNull)
              }
              if (touches.contains(e.event_type))
                buf = buf :+ (t, e.event_id)
            }
            if (buf.nonEmpty) {
              if (streaming) {
                state.update(AttributionState(buf))
                val lastMs = buf.last._1 / 1000L
                if (lastMs <= Long.MaxValue - lookbackMillis)
                  state.setTimeoutTimestamp(lastMs + lookbackMillis)
              } else state.remove()
            } else state.remove()
            out.iterator
          }
      }
  }
}
