package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass dataset profiling: per-column null counts, distinct
  * estimates, and min/max — the data-audit step that gates a 100 TB
  * ingest (schema drift, null explosions, and cardinality surprises
  * show up here before they corrupt downstream state).
  *
  * Scale shape: ONE aggregation over the table computes every
  * column's statistics simultaneously (a flat list of agg expressions
  * — partial map-side, final reduce-side, no per-column scans), then a
  * driver-free unpivot via `stack` reshapes the single stats row into
  * one row per column. Distinct counts use `approx_count_distinct`
  * (HLL++, fixed-size mergeable registers): an exact multi-column
  * distinct would expand the scan |columns|× and shuffle every value —
  * the estimate is the part that keeps one-pass true at scale. Min and
  * max are rendered as strings so heterogeneous column types survive
  * the unpivot's common schema.
  */
object Profiling {

  /** Profile `columns` (default: all) of `df` in one aggregation pass.
    * Output: (column, n_rows, n_null, n_distinct_approx, min_value,
    * max_value) — one row per profiled column; `n_rows` counts all
    * table rows, `n_distinct_approx` ignores nulls, and min/max are
    * cast to strings ("" when the column is entirely null).
    */
  def profile(df: DataFrame, columns: Seq[String] = Seq.empty,
              rsd: Double = 0.01): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "no columns to profile")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"),
        coalesce(min(col(c)).cast("string"), lit("")).as(s"__min_$c"),
        coalesce(max(col(c)).cast("string"), lit("")).as(s"__max_$c"))
    }
    val statsRow = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: stack(n, name1, rows1, null1, dist1, min1, max1, ...)
    val stackArgs: Seq[Column] = cols.flatMap { c =>
      Seq(lit(c), col(s"__rows_$c"), col(s"__null_$c"), col(s"__dist_$c"),
        col(s"__min_$c"), col(s"__max_$c"))
    }
    statsRow.select(stack(
      lit(cols.size) +: stackArgs: _*)
      .as(Seq("column", "n_rows", "n_null", "n_distinct_approx",
        "min_value", "max_value")))
  }

  /** Order-free content digest of a table (SURVEY §2.10 X126) — the
    * cheap "did two pipelines produce the IDENTICAL corpus" check the
    * engine's determinism contracts keep promising: every operator
    * here claims bit-identical replays across reruns, repartitions,
    * and engines, and this is the operator that verifies such a claim
    * on real data without sorting anything. Each row hashes to md5 of
    * its `cols` (concat_ws with a U+0001 separator — null-skipping,
    * the same rule in Spark and in DuckDB's concat_ws; stated contract:
    * a null column and an absent one are indistinguishable); rows bucket by hash prefix,
    * and each bucket aggregates three ORDER-FREE fingerprints:
    * row count, XOR of 48-bit hash slices (insensitive to order,
    * sensitive to any changed row), and a SUM of 32-bit slices
    * (catches the even-multiplicity duplicates XOR cancels; overflows
    * at 2³¹ rows per bucket — size nBuckets accordingly: the bucket is
    * a 32-bit hash prefix mod nBuckets, so any nBuckets ≤ 2²⁰ is
    * honored with modulo bias ≤ nBuckets/2³²). Two tables
    * are content-identical iff the digest tables match — comparable
    * as `nBuckets` rows regardless of corpus size.
    *
    * Scale shape: one projection + one groupBy on a uniform hash
    * bucket (skew-free by construction); the result is tiny and the
    * comparison is a join of two digest tables.
    */
  def contentDigest(df: DataFrame, cols: Seq[String],
                    nBuckets: Int = 256): DataFrame = {
    require(cols.nonEmpty, "at least one column to digest")
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      "nBuckets must be in [1, 2^20] (32-bit bucket prefix)")
    val h = md5(concat_ws("\u0001", cols.map(col): _*))
    df.select(
        pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)).as("bucket"),
        conv(substring(h, 9, 12), 16, 10).cast("long").as("__h48"),
        conv(substring(h, 21, 8), 16, 10).cast("long").as("__h32"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h48)").as("xor48"),
        sum(col("__h32")).as("sum32"))
  }

  /** Merge of [[contentDigest]] tables (SURVEY §2.10 X131):
    * `digest(A ∪ B) = mergeDigests(digest(A), digest(B))` — every
    * fingerprint is a commutative monoid (counts and sums add, XORs
    * xor), so an appended corpus's digest maintains INCREMENTALLY:
    * digest the append batch alone and merge, never rescan the
    * corpus. At 100 TB this is the difference between a digest you
    * actually keep current and one you computed once; it is the same
    * property that makes the fingerprints order-free in the first
    * place, promoted to the table level.
    *
    * Buckets present in only one side pass through unchanged (the
    * identity element is (0, 0, 0)). Cost: a union + one groupBy over
    * ≤ 2·nBuckets rows.
    */
  def mergeDigests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket"))
      .agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(xor48)").as("xor48"),
        sum(col("sum32")).as("sum32"))

  /** One-call corpus DATA CARD — the tall (metric, value) report a
    * corpus release ships next to the parquet: volume (docs, chars,
    * tokens), exact-duplicate rate, mean heuristic quality, mean
    * char-distribution entropy, the detected-language histogram, and
    * the Zipf fit (slope/r² — "does it still look like language").
    * Every number is an already-verified kernel (q19/q20/q21/q22/
    * q168/q172 shapes) composed into one relational dataflow: FOUR
    * corpus passes total (the scalar aggregates, the language
    * histogram, the entropy aggregation, the Zipf head — independent
    * aggregation subtrees each scan once) regardless of corpus size,
    * each pass map-side combinable. Metric names are stable — diff
    * two releases' cards directly.
    *
    * @return (metric string, value double) — counts cast to double so
    *         the card is one homogeneous, pivot-free table
    */
  def corpusReport(docs: DataFrame, zipfTopN: Int = 200,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val T = graft.llmops.TextFuncs
    val tc = T.tokenCount(col(textCol))
    // pass 1: every scalar aggregate at once
    val scalars = docs.agg(
        count(lit(1)).cast("double").as("n_docs"),
        countDistinct(md5(col(textCol))).cast("double").as("n_unique"),
        sum(length(col(textCol))).cast("double").as("n_chars"),
        sum(tc).cast("double").as("n_tokens"),
        avg(T.qualityScore(col(textCol))).as("mean_quality"))
      .select(explode(map(
        lit("n_docs"), col("n_docs"),
        lit("n_unique_texts"), col("n_unique"),
        lit("exact_dup_rate"),
        lit(1.0) - col("n_unique") / col("n_docs"),
        lit("n_chars"), col("n_chars"),
        lit("n_tokens"), col("n_tokens"),
        lit("mean_quality"), col("mean_quality")))
        .as(Seq("metric", "value")))
    // lang histogram rides the same tokenize shape as q22
    val langs = docs
      .groupBy(T.langIdFromTokens(T.tokens(col(textCol))).as("__l"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(concat(lit("lang:"), col("__l")).as("metric"),
        col("value"))
    val entropy = T.charEntropy(docs, idCol, textCol)
      .agg(avg(col("char_entropy")).as("value"))
      .select(lit("mean_char_entropy").as("metric"), col("value"))
    val zipf = T.zipfFit(docs, zipfTopN, textCol)
      .select(explode(map(
        lit("zipf_slope"), col("slope"),
        lit("zipf_r2"), col("r2")))
        .as(Seq("metric", "value")))
    scalars.unionByName(langs).unionByName(entropy).unionByName(zipf)
  }

  /** Key-skew report (X171): the top-k heaviest keys with the global
    * distribution stats attached — the diagnostic to run BEFORE a big
    * join or aggregation ships: a `share` in double digits on one key
    * is the straggler that X25's salted join exists for, and the
    * p99/max spread says whether salting or AQE skew handling is the
    * right lever. One groupBy to (key, n), one scalar aggregate over
    * the count table, one TakeOrdered — no global window; the exact
    * p99 runs over the count DISTRIBUTION (distinct count VALUES,
    * small by nature), the reporting-tier contract of q188.
    *
    * @return k rows: (key, n, share, n_rows, n_keys, max_n, p99_n)
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_n"),
      percentile(col("n"), lit(0.99)).as("p99_n"))
    counts.orderBy(col("n").desc, col("key")).limit(k)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("n_rows")).as("share"),
        col("n_rows"), col("n_keys"), col("max_n"), col("p99_n"))
  }

  /** Functional-dependency audit (X177): does `lhs → rhs` hold, and
    * where does it break — the ingest-QA primitive behind "is doc_id
    * a key", "does url determine host", "does order determine
    * status". Schema contracts like these silently rot as sources
    * change; the audit is one aggregation, and the VIOLATING groups
    * (lhs values mapping to > 1 distinct rhs) come back ranked with
    * the global counts attached, so the report both quantifies the
    * rot and points at it.
    *
    * Scale shape: one groupBy on lhs with a distinct-count aggregate,
    * one scalar roll-up, one TakeOrdered — the [[skewReport]]
    * arrangement. `rhs` distinct counts are exact (the contract is
    * exact; HLL would report phantom violations).
    *
    * @return k rows: (lhs…, n_rhs_values, n_rows, n_groups,
    *         n_violating) — empty ⟺ the dependency HOLDS
    */
  def fdViolations(df: DataFrame, lhs: Seq[String], rhs: String,
                   k: Int = 10): DataFrame = {
    require(lhs.nonEmpty, "at least one determinant column")
    val groups = df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("n_rhs_values"),
        count(lit(1)).as("n_rows"))
    val stats = groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("n_rhs_values") > 1, 1L).otherwise(0L))
        .as("n_violating"))
    groups.filter(col("n_rhs_values") > 1)
      .orderBy(col("n_rhs_values").desc +: lhs.map(col): _*)
      .limit(k)
      .crossJoin(broadcast(stats))
  }

  /** Foreign-key integrity audit (X185): does every child row point
    * at exactly one parent? The referential-health dashboard row a
    * pipeline checks BEFORE joining — an orphan rate discovered at
    * join time is a silent row-loss bug (inner joins drop orphans
    * without a trace), discovered here it is a data incident with a
    * count. Complements [[fdViolations]] (intra-table consistency)
    * with the inter-table axis.
    *
    * One aggregate per side plus one left anti join, all on slim key
    * projections — the child table's payload never moves:
    *
    * @return single row (relation, child_rows, null_keys, orphans,
    *         orphan_rate, parent_keys, parent_dup_keys): `orphans` =
    *         non-null child keys with no parent row; `orphan_rate`
    *         over non-null keys (4dp); `parent_dup_keys` = parent
    *         keys appearing more than once (a "foreign key" into a
    *         non-unique parent fans out — the other silent join bug).
    */
  def fkAudit(child: DataFrame, parent: DataFrame, childKey: String,
              parentKey: String, relation: String): DataFrame = {
    val ck = child.select(col(childKey).as("__k"))
    val pk = parent.select(col(parentKey).as("__k"))
    val childStats = ck.agg(
      count(lit(1)).as("child_rows"),
      sum(when(col("__k").isNull, 1L).otherwise(0L)).as("null_keys"))
    // NULL parent keys are unreferencable — exclude them (also the
    // oracle's count(DISTINCT ...) semantics), else a parent table
    // with NULL keys inflates parent_keys/parent_dup_keys
    val parentStats = pk.filter(col("__k").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("parent_keys"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("parent_dup_keys"))
    val orphans = ck.filter(col("__k").isNotNull)
      .join(pk.select(col("__k")).distinct(), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    childStats.crossJoin(orphans).crossJoin(parentStats)
      .select(lit(relation).as("relation"),
        col("child_rows"), col("null_keys"), col("orphans"),
        round(col("orphans") /
          greatest(col("child_rows") - col("null_keys"), lit(1L))
            .cast("double"), 4).as("orphan_rate"),
        col("parent_keys"), col("parent_dup_keys"))
  }

  /** Sample-representativeness audit (X189): does a sample preserve
    * the source's category mix? Every deterministic sampler in the
    * suite (md5-gated splits, weighted/per-group samplers) CLAIMS
    * distribution preservation; this is the receipt — the classic
    * Pearson χ² goodness-of-fit decomposition, per category, so a
    * skewed stratum is named, not hidden inside one scalar. Two
    * slim-key aggregates + one broadcast join; the χ² statistic and
    * the degrees of freedom ride on every row (constant columns) so
    * the scalar travels with the frame.
    *
    * Categories present in the sample but not the source are a
    * CONTRACT VIOLATION (a sampler invented data); flagged with
    * `expected` 0 and an infinite-contribution guard (contrib = n²
    * when expected = 0) rather than dropped.
    *
    * @return one row per category: (category, n_source, n_sample,
    *         expected, contrib, chi2, dof) — expected/contrib/chi2
    *         4dp
    */
  def sampleAudit(source: DataFrame, sample: DataFrame, byCol: String)
      : DataFrame = {
    val src = source.groupBy(col(byCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n_source"))
    val smp = sample.groupBy(col(byCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n_sample"))
    val joined = src.join(smp, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_source"), lit(0L)).as("n_source"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample"))
    val totals = joined.agg(sum(col("n_source")).as("__ns"),
      sum(col("n_sample")).as("__np"))
    val withExp = joined.crossJoin(broadcast(totals))
      .withColumn("expected",
        col("n_source") * col("__np") / col("__ns").cast("double"))
      .withColumn("contrib",
        when(col("expected") > 0.0,
          pow(col("n_sample") - col("expected"), 2.0) / col("expected"))
          .otherwise(pow(col("n_sample").cast("double"), 2.0)))
    val chi = withExp.agg(sum(col("contrib")).as("__chi2"),
      count(lit(1)).as("__k"))
    withExp.crossJoin(broadcast(chi))
      .select(col("category"), col("n_source"), col("n_sample"),
        round(col("expected"), 4).as("expected"),
        round(col("contrib"), 4).as("contrib"),
        round(col("__chi2"), 4).as("chi2"),
        (col("__k") - 1L).as("dof"))
  }

  /** Concentration report (X200): per group, how unequally a weight
    * (events, bytes, tokens) distributes over its keys (users, hosts,
    * documents) — Gini coefficient plus the top-decile share. The
    * load-shape numbers behind capacity and abuse decisions: a host
    * cap ([[graft.llmops.Splits]] hostCapSample) is justified by
    * exactly this report, and a Gini jump between corpus versions
    * flags a new heavy hitter the skew report (q198) then names.
    *
    * Gini by the exact rank formula over ascending per-key totals:
    * G = (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n — one groupBy to per-key
    * totals, one row_number window per group over those slim rows
    * (bounded by keys-per-group, never raw events), two sums.
    * Deterministic: equal totals tie-break on key.
    *
    * @return per group: (group, n_keys, total, gini, top10_share) —
    *         4dp; single-key groups report gini 0
    */
  def concentrationReport(df: DataFrame, groupCol: String,
                          keyCol: String, weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(col(groupCol).as("group"), col(keyCol).as("__k"))
      .agg(sum(weight).cast("double").as("__x"))
    val wOrd = Window.partitionBy(col("group"))
      .orderBy(col("__x"), col("__k"))
    val ranked = per.withColumn("__i", row_number().over(wOrd))
    val agg = ranked.groupBy(col("group"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
    val deciles = ranked
      .join(agg.select(col("group"), col("n_keys").as("__n")), Seq("group"))
      .filter(col("__i") > col("__n") - ceil(col("__n") / lit(10.0)))
      .groupBy(col("group")).agg(sum(col("__x")).as("__top"))
    agg.join(deciles, Seq("group"), "left")
      .select(col("group"), col("n_keys"),
        col("total").cast("long").as("total"),
        round(when(col("n_keys") > 1,
          lit(2.0) * col("__ix") / (col("n_keys") * col("total")) -
            (col("n_keys") + 1.0) / col("n_keys"))
          .otherwise(lit(0.0)), 4).as("gini"),
        round(coalesce(col("__top"), lit(0.0)) / col("total"), 4)
          .as("top10_share"))
  }
}
