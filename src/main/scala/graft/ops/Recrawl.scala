package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-rate-driven recrawl scheduling (X178): from a fetch history
  * (url, ts, content hash), estimate how often each URL actually
  * changes and schedule the next fetch accordingly — the freshness
  * economics of a crawl at scale: a fixed revisit interval wastes the
  * fleet on static pages AND goes stale on fast movers; the observed
  * change rate is the signal that splits the budget (the classic
  * Cho & Garcia-Molina freshness result, as one aggregation).
  *
  * Estimator, stated exactly so the oracle replays it: a CHANGE is an
  * observation whose hash differs from the same URL's previous
  * observation ((ts, hash) tiebreak on equal timestamps); the
  * estimated change interval is span/n_changes (observation span over
  * observed changes, floor-divided — integer-exact), clamped to
  * [minIntervalMillis, maxIntervalMillis]; URLs with no observed
  * change (or a single observation) schedule at the max interval —
  * "no evidence of motion" is a reason to back off, never to poll.
  * next_fetch_ms = last observation + the clamped interval.
  *
  * Scale shape: one lag window per URL over slim (url, ts, hash)
  * rows, one groupBy — the sessionize arrangement; output is one row
  * per URL.
  */
object Recrawl {

  /** @return (url, n_obs, n_changes, span_ms, interval_ms,
    *         next_fetch_ms) — interval clamped, fetch-history
    *         semantics above
    */
  def schedule(history: DataFrame,
               minIntervalMillis: Long = 3600000L,
               maxIntervalMillis: Long = 30L * 86400000L,
               urlCol: String = "url", tsCol: String = "ts",
               hashCol: String = "content_hash"): DataFrame = {
    require(minIntervalMillis >= 1 &&
      maxIntervalMillis >= minIntervalMillis,
      "need 1 <= minIntervalMillis <= maxIntervalMillis")
    val w = Window.partitionBy(col("url"))
      .orderBy(col("__ms"), col("__h"))
    val obs = history
      .select(col(urlCol).as("url"),
        (graft.expr.TimeFuncs.tsMicros(col(tsCol)) / 1000L)
          .cast("long").as("__ms"),
        col(hashCol).as("__h"))
      .withColumn("__chg",
        when(lag(col("__h"), 1).over(w).isNotNull &&
          lag(col("__h"), 1).over(w) =!= col("__h"), 1L)
          .otherwise(0L))
    val agg = obs.groupBy(col("url"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__chg")).as("n_changes"),
        (max(col("__ms")) - min(col("__ms"))).as("span_ms"),
        max(col("__ms")).as("__last"))
    agg
      .withColumn("interval_ms",
        least(greatest(
          when(col("n_changes") > 0,
            floor(col("span_ms") / col("n_changes")).cast("long"))
            .otherwise(lit(maxIntervalMillis)),
          lit(minIntervalMillis)), lit(maxIntervalMillis)))
      .select(col("url"), col("n_obs"), col("n_changes"),
        col("span_ms"), col("interval_ms"),
        (col("__last") + col("interval_ms")).as("next_fetch_ms"))
  }

  /** Content drift between consecutive fetches of the same URL
    * (X184): HOW MUCH a page changed, not just whether its hash moved
    * — the refinement [[schedule]] consumes when hash-level change is
    * too blunt (rotating ads flip the hash on every fetch; the drift
    * ratio separates cosmetic churn from real content motion, the
    * Ntoulas/Cho/Olston "what's new on the web" measurement).
    *
    * Per (url, version) row: normalized Levenshtein distance between
    * the version's text and its predecessor's, both capped at
    * `maxChars` (edit distance is quadratic; the cap bounds per-row
    * cost exactly like [[graft.llmops.Dedup.editSimilarityPairs]],
    * and a 2 000-char prefix decides "rewritten vs tweaked" just
    * fine). First version of a URL has no predecessor: drift null.
    * One lag window over (url, ts)-sorted slim rows — text moves
    * once, on the uniform url key.
    *
    * @return (url, ts, prev_ts, drift): drift = lev(prev, cur) /
    *         max(len) over the capped texts, 4dp, null for the first
    *         observation
    */
  def contentDrift(history: DataFrame, maxChars: Int = 2000,
                   urlCol: String = "url", tsCol: String = "ts",
                   textCol: String = "text"): DataFrame = {
    require(maxChars >= 1, "maxChars must be >= 1")
    val w = Window.partitionBy(col("url")).orderBy(col("ts"))
    val capped = history.select(col(urlCol).as("url"),
      col(tsCol).as("ts"),
      substring(col(textCol), 1, maxChars).as("__t"))
    capped
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .withColumn("__prev_ts", lag(col("ts"), 1).over(w))
      .select(col("url"), col("ts"), col("__prev_ts").as("prev_ts"),
        when(col("__prev").isNotNull,
          round(levenshtein(col("__prev"), col("__t")) /
            greatest(length(col("__prev")), length(col("__t")), lit(1))
              .cast("double"), 4)).as("drift"))
  }

  /** Crawl politeness audit (X231) — did the fetcher RESPECT its
    * per-host rate limit? The library's token-bucket limiter (U9) is
    * per-JVM by documented divergence, so a multi-executor crawl can
    * exceed a host's budget in aggregate; this is the after-the-fact
    * receipt over the fetch ledger: per host, consecutive-fetch gap
    * stats and how many gaps undercut `minGapMillis` (the floor a
    * crawl-policy or robots `Crawl-delay` implies). The audit every
    * production crawl should publish next to its corpus.
    *
    * One lag window per host over slim (host, ts[, end]) rows — the
    * ledger shuffles once on the host key; single-fetch hosts report
    * zero gaps and pass vacuously.
    *
    * Gap semantics: WITHOUT `endCol` the gap is start-to-start — the
    * documented divergence, honest only when fetch durations are
    * negligible next to the floor. With `endCol` (a fetch-completion
    * timestamp) the gap is start-vs-PREVIOUS-END, ordered by start:
    * overlapping fetches to one host yield NEGATIVE gaps, which
    * undercut any floor ≥ 0 and so always count as violations —
    * concurrent per-host connections are exactly the politeness
    * breach a start-to-start audit cannot see.
    *
    * @return (host, n_fetches, n_gaps, min_gap_ms, mean_gap_ms,
    *         n_violations, ok) — mean 4dp; min/mean null when a host
    *         has one fetch; ok = no gap under the floor
    */
  def politenessAudit(fetches: DataFrame, minGapMillis: Long,
                      hostCol: String = "host", tsCol: String = "ts",
                      endCol: Option[String] = None): DataFrame = {
    require(minGapMillis >= 0, "minGapMillis must be >= 0")
    // tsMicros handles both TIMESTAMP and TIMESTAMP_NTZ (the
    // parquet tables' type) — same idiom as Anomaly's buckets
    def ms(c: String) =
      floor(graft.expr.TimeFuncs.tsMicros(col(c)) / 1000L).cast("long")
    val gaps = fetches
      .select(col(hostCol).as("__h"), ms(tsCol).as("__ms"),
        endCol.map(ms).getOrElse(ms(tsCol)).as("__end"))
      .withColumn("__gap", col("__ms") -
        lag(col("__end"), 1).over(
          Window.partitionBy(col("__h"))
            .orderBy(col("__ms"), col("__end"))))
    gaps.groupBy(col("__h").as("host"))
      .agg(count(lit(1)).as("n_fetches"),
        count(col("__gap")).as("n_gaps"),
        min(col("__gap")).as("min_gap_ms"),
        round(avg(col("__gap")), 4).as("mean_gap_ms"),
        coalesce(sum(when(col("__gap") < minGapMillis, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
      .withColumn("ok", col("n_violations") === 0)
  }
}
