package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-path analysis over the event log: the empirical
  * Markov transition matrix (which event follows which, and with what
  * probability) and the top-k next events per antecedent — the
  * "what do users do after X" primitive next to [[Sessionize]]
  * (when), [[Funnels]] (did they reach Y), and [[Cohorts]] (do they
  * come back). On a crawl/ingest ledger the same shape answers
  * operational questions: which state follows `fetch_error`, what
  * fraction of `enqueue` transitions reach `parse`.
  *
  * Determinism: consecutive pairs are formed per user ordered by
  * (ts, event id) — the id tiebreak makes the sequence, and therefore
  * every count, a pure function of the data under any parallelism
  * (same-timestamp events would otherwise pair nondeterministically).
  *
  * Scale shape: one window (lead) per user key over slim
  * (user, type, ts, id) rows — the sessionize arrangement — then a
  * count aggregation whose result is at most |types|² rows; the
  * per-antecedent normalization windows run over THAT
  * construction-bounded matrix, never over events.
  */
object Paths {

  /** Empirical transition matrix (prev_type, next_type, n, p):
    * `n` = consecutive (prev → next) pairs within a user's stream
    * whose gap is < `maxGapMillis` (a session-style cut: pairs
    * straddling a longer silence are not behavioral transitions);
    * `p` = n / Σ n over the same prev_type. End-of-stream and
    * cut pairs contribute to no row (absence, not a synthetic
    * terminal state — callers wanting one can append it).
    */
  def transitionMatrix(events: DataFrame,
                       maxGapMillis: Long = Long.MaxValue,
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    require(maxGapMillis >= 1, "maxGapMillis must be >= 1")
    // order on the micros projection (identical order to the raw
    // timestamp — Spark timestamps ARE microseconds) + id tiebreak
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col(idCol))
    val us = graft.expr.TimeFuncs.tsMicros(col(tsCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("prev_type"),
        us.as("__us"), col(idCol))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .withColumn("__gap_us", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("next_type").isNotNull && (
        // an effectively-unbounded gap keeps every pair (and avoids
        // the ms→µs literal overflow under ANSI arithmetic)
        if (maxGapMillis >= Long.MaxValue / 1000L) lit(true)
        else col("__gap_us") < lit(maxGapMillis * 1000L)))
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val wPrev = Window.partitionBy(col("prev_type"))
    counts.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(wPrev))
  }

  /** Top-k session JOURNEYS (X170): the most common ordered sequences
    * of a session's first `maxLen` event types, sessions cut at
    * `gapMillis` exactly as [[Sessionize.sessions]] — the multi-step
    * generalization of [[transitionMatrix]]'s single step: "what do
    * users DO here" as ranked paths ("view > click > purchase"
    * 3 812 sessions, "view > error > view" 977...), the product-
    * analytics journey report and, on a crawl ledger, the dominant
    * fetch-state flows.
    *
    * Scale shape: the session cut and position windows partition per
    * user (the sessionize arrangement); the path roll-up is one
    * groupBy per session then one per path (≤ |types|^maxLen distinct
    * paths, in practice a short head); the final top-k is a
    * TakeOrdered, never a global window.
    *
    * @return (path, n_sessions), top k by (count desc, path asc)
    */
  def topSessionPaths(events: DataFrame, gapMillis: Long,
                      maxLen: Int = 5, k: Int = 10,
                      userCol: String = "user_id",
                      typeCol: String = "event_type",
                      tsCol: String = "ts",
                      idCol: String = "event_id"): DataFrame = {
    require(gapMillis >= 1, "gapMillis must be >= 1")
    require(maxLen >= 1 && k >= 1, "maxLen and k must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__ms"), col(idCol))
    val sessions = events
      .select(col(userCol), col(idCol), col(typeCol).as("__t"),
        (graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L)
          .cast("long").as("__ms"))
      .withColumn("__new",
        when(lag(col("__ms"), 1).over(w).isNull ||
          col("__ms") - lag(col("__ms"), 1).over(w) > gapMillis, 1L)
          .otherwise(0L))
      .withColumn("__sid",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wPos = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col("__ms"), col(idCol))
    sessions
      .withColumn("__pos", row_number().over(wPos))
      .filter(col("__pos") <= maxLen)
      .groupBy(col(userCol), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__t")))),
        s => s.getField("__t")), " > ").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Top-k next events per antecedent by (n desc, next_type asc) —
    * the rank window rides the X46 rewrite to a bounded-heap
    * WindowGroupLimit, so nothing beyond k rows per prev_type
    * survives the partial aggregation.
    */
  def topNextEvents(events: DataFrame, k: Int,
                    maxGapMillis: Long = Long.MaxValue,
                    userCol: String = "user_id",
                    typeCol: String = "event_type",
                    tsCol: String = "ts",
                    idCol: String = "event_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val m = transitionMatrix(events, maxGapMillis, userCol, typeCol,
      tsCol, idCol)
    val w = Window.partitionBy(col("prev_type"))
      .orderBy(col("n").desc, col("next_type"))
    m.withColumn("rank", rank().over(w))
      .filter(col("rank") <= k)
  }
}
