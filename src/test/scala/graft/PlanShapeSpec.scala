package graft

/** Physical-plan shape assertions for the scale-critical queries: the
  * properties SCALING.md claims (broadcasts, rank-window lowering,
  * parquet pushdown, partial aggregation, whole-stage codegen) are
  * pinned here so a regression in plan shape fails CI, not a 100 TB
  * run.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q04: dimension side of the fact join is broadcast") {
    assert(plan("q04_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q05: both dims broadcast — no shuffle join anywhere") {
    val p = plan("q05_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q07: rank-window top-k becomes the bounded-heap aggregate") {
    // in a GraftExtensions session the RewriteWindowTopK rule replaces
    // the window with collect_top_k (map-side partial top-k); without
    // the rule, Spark's own WindowGroupLimit lowering is the floor —
    // each partition discards rows below rank k BEFORE the shuffle
    assert(plan("q07_topk_per_group").contains("collect_top_k"))
    spark.conf.set("spark.graft.rewriteWindowTopK", "false")
    try assert(plan("q07_topk_per_group").contains("WindowGroupLimit"))
    finally spark.conf.unset("spark.graft.rewriteWindowTopK")
  }

  test("q02: filter is pushed into the parquet scan") {
    val p = plan("q02_segment_filter")
    assert(p.contains("PushedFilters: [In(c_mktsegment"), p.take(2000))
  }

  test("q01: aggregation is partial (map-side) then final") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    // map-side combine before the exchange
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q02: scan reads only referenced columns (pruning)") {
    val p = plan("q02_segment_filter")
    // only the two referenced customer columns reach the scan
    assert(p.contains("ReadSchema: struct<c_mktsegment:string,c_acctbal:double>")
      || p.contains("ReadSchema: struct<c_acctbal:double,c_mktsegment:string>"),
      p.slice(p.indexOf("ReadSchema") - 200, p.indexOf("ReadSchema") + 200))
  }

  test("q23/q49: scale path replaces the window with partial aggregation") {
    // q23 is written as the rank window (the oracle anchor); in a
    // GraftExtensions session RewriteWindowTopK turns even that form
    // into the bounded-heap plan. q49 uses the aggregate API directly.
    assert(plan("q23_cosine_topk").contains("collect_top_k"))
    spark.conf.set("spark.graft.rewriteWindowTopK", "false")
    try assert(plan("q23_cosine_topk").contains("Window"))
    finally spark.conf.unset("spark.graft.rewriteWindowTopK")
    val agg = plan("q49_cosine_topk_agg")
    assert("ObjectHashAggregate".r.findAllIn(agg).size >= 2)
  }

  test("q41: as-of join is union+window — no join operator at all") {
    val p = plan("q41_asof_join")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("NestedLoop"), p.take(1500))
    assert(p.contains("Window") && p.contains("Union"))
  }

  test("q46: range join is bucketed equi-join, never a cartesian product") {
    val p = plan("q46_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q37: sessionize windows and aggregation share one hash exchange") {
    // lag + running sum + groupBy all partition by user_id — Catalyst
    // must plan exactly one hashpartitioning exchange for all three
    val p = plan("q37_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2500))
  }

  test("q55/q56: PII redaction and repetition stats shuffle only to aggregate") {
    // the per-doc signals are narrow maps; q55 is shuffle-free modulo
    // the output sort, q56 shuffles once for the per-source aggregate
    val p55 = plan("q55_pii_redact")
    assert(!p55.contains("Exchange hashpartitioning"), p55.take(1500))
    val p56 = plan("q56_repetition")
    assert("Exchange hashpartitioning".r.findAllIn(p56).size == 1, p56.take(2000))
  }

  test("q57: packing cumsum window and bin stats share one hash exchange") {
    // the window partitions by (source, stream) and the groupBy by
    // (source, stream, bin_id) — the agg's partial phase runs on the
    // window's partitioning, so only one hash exchange + the partial
    // aggregation appears before the final agg
    val p = plan("q57_pack_bins")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(2500))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(2500))
  }

  test("q58: the dimension chain is all broadcast — fact side never shuffles for a join") {
    val p = plan("q58_supplier_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q62: bloom test filters the fact scan before any join") {
    val p = plan("q62_bloom_prune")
    // the might_contain filter sits below the semi-join in the plan
    assert(p.contains("might_contain"), p.take(2000))
    val filterAt = p.indexOf("might_contain")
    val joinAt = p.indexOf("Join LeftSemi") match {
      case -1 => p.indexOf("BroadcastHashJoin")
      case i => i
    }
    assert(joinAt >= 0 && filterAt > joinAt, // physical plans print top-down
      s"join@$joinAt filter@$filterAt\n" + p.take(2000))
  }

  test("q61: stratified sample is a scalar projection — one hash exchange, for the agg") {
    val p = plan("q61_stratified_sample")
    // keep-decision shuffles nothing; the only hash exchange is the
    // aggregation's (the display orderBy adds a range exchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("partial_"), p.take(2000)) // map-side combine
  }

  test("q64: per-group sample lowers to WindowGroupLimit") {
    assert(plan("q64_group_sample").contains("WindowGroupLimit"))
  }

  test("q66: shuffle-order probe lowers to TakeOrderedAndProject, not a global sort") {
    assert(plan("q66_corpus_shuffle").contains("TakeOrderedAndProject"))
  }

  test("q67: quantile thresholds broadcast; bin assignment is a narrow map") {
    val p = plan("q67_quantile_bins")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q65: bloom split keeps the clean branch join-free; suspects broadcast-anti-join") {
    val p = plan("q65_bloom_decontam")
    assert(p.contains("might_contain"), p.take(2000))
    // the anti-join is broadcast (digest keys), never a sort-merge
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("banded pair generators: bucket-cap window reuses the join exchange") {
    // capBuckets counts over (band, band_hash) — the same keys the
    // candidate self-join shuffles on; the window's exchange must be
    // reused for the join rather than shuffling a second time
    val p = plan("q24_minhash_pairs")
    assert(p.contains("ReusedExchange") ||
      "Exchange hashpartitioning\\(band".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q76: benchmark gram set broadcasts — corpus side never shuffles for the join") {
    val p = plan("q76_ngram_decontam")
    assert(p.contains("BroadcastHashJoin") &&
      p.toLowerCase.contains("leftsemi"), p.take(3000))
  }

  test("q77: token budget is ONE window pass — a single exchange for the cumsum") {
    val p = graft.llmops.Splits.tokenBudgetSample(
      Tables.documents(spark, sf0001).select("doc_id", "source", "text"),
      budgetPerGroup = 4000L, streams = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2500))
    assert(p.contains("Window"), p.take(2500))
  }

  test("q79: snapshot diff joins digests — text never reaches the join exchange") {
    // the full-outer join's exchanges must carry only key+digests;
    // the text column dies at the project below the digest computation
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val p = graft.ops.SnapshotDiff.diff(docs, docs)
      .queryExecution.executedPlan.toString
    val exchanges = "(?s)Exchange[^\\n]*".r.findAllIn(p).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text")), p.take(2500))
  }

  test("chunking: sliding windows are a narrow shuffle-free pipeline") {
    // tokenize → sequence → posexplode never leaves the input
    // partition: any Exchange here would be a scale regression
    val p = llmops.Chunking.slidingChunks(
      Tables.documents(spark, sf0001).select("doc_id", "text"), 32, 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("q92: SQ8 scan broadcasts the query batch — corpus never shuffles") {
    val p = plan("q92_sq8_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    // the re-rank is the bounded-heap aggregate, not a window
    assert(p.contains("collect_top_k"))
  }

  test("q93: indexed query scan carries the probe partition filter") {
    // the probed lists must reach the index scan as PartitionFilters —
    // pruned before read, not filtered after (spark-warehouse write
    // happens inside the query; plan() builds it fresh)
    val p = plan("q93_ann_index")
    val scanSection = p.slice(math.max(0, p.indexOf("PartitionFilters") - 100),
      math.min(p.length, p.indexOf("PartitionFilters") + 300))
    assert(p.contains("PartitionFilters: [list_id"), scanSection)
    assert(p.contains("collect_top_k"))
  }

  test("q100: DSIR ratio table broadcasts; selection is TakeOrdered, " +
    "and the only sort-merge join is the bounded model-table merge") {
    val p = plan("q100_dsir_select")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // logRatios merges the two ≤65 536-row bucket tables FULL OUTER —
    // full outer has no broadcast build side, and both inputs are
    // model-sized, so an SMJ there is correct; what must never SMJ is
    // the corpus side
    val smjLines = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(smjLines.forall(_.contains("FullOuter")), smjLines.mkString("\n"))
  }

  test("q101: mixture rates broadcast back — the corpus side never " +
    "shuffles for the rate join") {
    val p = plan("q101_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q103: BM25 query terms and idf broadcast; top-k is TakeOrdered") {
    val p = plan("q103_bm25_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q104: the quantile sketch partial-aggregates map-side") {
    val p = plan("q104_approx_quantile")
    assert(p.contains("partial_percentile_approx") ||
      p.contains("partial_percentile"), p.take(2000))
  }

  test("q106: the MG summary partial-aggregates map-side as an object " +
       "hash agg — the exchange carries one k-entry buffer per partition") {
    val p = plan("q106_heavy_hitters")
    assert(p.contains("partial_freq_items"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }

  test("q107: both KMV sketches partial-aggregate; the 1x1 sketch " +
       "combine is a broadcast, not a cartesian") {
    val p = plan("q107_kmv_overlap")
    assert(p.contains("partial_kmv_sketch"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q118/q119: pdf decode is one narrow mapPartitions pass — the " +
       "only exchange is the display sort") {
    for (q <- Seq("q118_pdf_extract", "q119_pdf_roundtrip")) {
      val p = plan(q)
      assert(p.contains("MapPartitions"), s"$q lost the narrow decode:\n" +
        p.take(2000))
      assert(!p.contains("hashpartitioning"),
        s"$q grew a shuffle beyond the display sort:\n" + p.take(3000))
      assert(!p.contains("Join"), s"$q grew a join:\n" + p.take(2000))
    }
  }

  test("q134: the multi-query batch ranks through the bounded heap — " +
       "no rank window on the scored stream, term/query maps broadcast") {
    val p = plan("q134_bm25_batch_rrf")
    // per-query top-k and the RRF re-rank are collect_top_k object
    // aggregates, never row_number windows over the scored rows
    assert(p.contains("collect_top_k"), p.take(2000))
    assert(!p.contains("row_number"), p.take(3000))
    // the (query, term) fan-out and the rank join-backs broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q137: the host-cap lottery ranks slim rows — text stays out " +
       "of the window exchange") {
    // structural, not string-scanned (a cached documents relation from
    // another suite changes the rendered text): the WindowExec's input
    // must carry ONLY the slim lottery columns
    val w = SparkEntry.queries("q137_host_cap")(spark, sf0001)
      .queryExecution.sparkPlan.collectFirst {
        case we: org.apache.spark.sql.execution.window.WindowExec => we
      }.get
    val cols = w.child.output.map(_.name).toSet
    assert(!cols.contains("text"),
      s"document text entered the lottery exchange: $cols")
    // _w0 is the window's own md5 sort key projection
    assert(cols.subsetOf(Set("host", "doc_id", "_w0")), s"cols=$cols")
  }

  test("q116: the packing prefix sum is bucket-partitioned — no " +
       "single-task global sort anywhere in the operator") {
    // the window must run partitionBy(__b); its required ordering is a
    // PARTITION-LOCAL sort after a hash exchange on the bucket column.
    // The only range/global sort allowed is the harness's display
    // ORDER BY — i.e. it must sit ABOVE the Generate (fragment
    // explode), never below it.
    val p = plan("q116_pack_sequences")
    assert(p.contains("windowspecdefinition(__b"), p.take(3000))
    assert(p.contains("hashpartitioning(__b"), p.take(3000))
    val gen = p.indexOf("Generate")
    val range = p.lastIndexOf("rangepartitioning")
    assert(gen >= 0 && (range < 0 || range < gen),
      "a range sort appeared below the fragment explode:\n" + p.take(3000))
  }

  test("q147: queries and positives broadcast; per-query top-k is the " +
       "bounded heap, not a rank window") {
    val p = plan("q147_hard_negatives")
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r
      .findAllIn(p).size >= 2, "both small sides must broadcast")
    assert(p.contains("collect_top_k"), "negatives must heap-select")
  }

  test("q148/q152/q153/q154: the events-table analytics shuffle on " +
       "the user hash and nothing else joins event rows to event rows") {
    // sessionize: windows partition by user
    val ps = plan("q148_sessionize")
    assert(ps.contains("hashpartitioning(user_id"), ps.take(2000))
    // funnel: every join input is a per-user aggregate (one
    // HashAggregate below each join leg), never raw events x events
    val pf = plan("q153_funnel")
    assert(!pf.contains("CartesianProduct"), "event x event blowup")
    // scd2: both windows ride ONE user-hash exchange
    val p4 = plan("q154_scd2_intervals")
    assert("hashpartitioning\\(user_id".r.findAllIn(p4).nonEmpty)
  }

  test("q155: the weighted sample is a TakeOrdered — no global sort " +
       "shuffle for k winners") {
    val p = plan("q155_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("rangepartitioning"),
      "a global range sort crept into the race:\n" + p.take(2000))
  }

  test("q167: the AC blocklist expressions evaluate inside a " +
       "whole-stage codegen span — no fallback to interpreted eval") {
    val df = SparkEntry.queries("q167_blocklist")(spark, sf0001)
    df.collect() // finalize AQE so codegen regions render
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("contains_any") && p.contains("matched_terms"),
      p.take(2000))
    // the Project LINE carrying the expressions must itself render
    // inside a WholeStageCodegen star region — not merely sit below
    // some other codegen'd operator
    val line = p.linesIterator.find(_.contains("contains_any")).get
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(line).isDefined,
      "the AC Project is not codegen'd:\n" + line)
  }

  test("q156: the content digest is one projection and one hash " +
       "aggregation — a single exchange on the digest bucket") {
    val p = plan("q156_content_digest")
    assert("hashpartitioning\\(bucket".r.findAllIn(p).nonEmpty,
      p.take(2000))
    // partial + final aggregate pair, nothing else exchanges besides
    // the harness's display sort
    assert("HashAggregate".r.findAllIn(p).size == 2, p.take(2000))
  }

  test("q182/q190: the graph operators never fall into a cartesian " +
       "or nested-loop join — every stage is an equi-join") {
    for (q <- Seq("q182_triangles", "q190_kcore")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(2000)}")
    }
  }

  test("q196: the per-prefix top-k rank lowers to the bounded path") {
    // the rank is PROJECTED in the output (the X46 heap rewrite only
    // applies when it is filter-only), so the guarantee here is
    // Spark's own lowering: a PARTIAL WindowGroupLimit discards rows
    // below rank k before the shuffle, a Final one after
    val p = plan("q196_prefix_completions")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("q197/q198: journey and skew top-k are TakeOrdered, never a " +
       "global sort of the full aggregate") {
    assert(plan("q197_session_paths").contains("TakeOrderedAndProject"))
    assert(plan("q198_skew_report").contains("TakeOrderedAndProject"))
  }

  test("q199: the CDC merge is one hash aggregation on the key — no " +
       "window, no sort-merge join in the resolution path") {
    val p = plan("q199_cdc_merge")
    assert(!p.contains("Window"), p.take(2000))
    assert("max_by|MaxBy".r.findFirstIn(p).isDefined ||
      p.contains("HashAggregate"), p.take(2000))
  }

  test("q201: rank normalization joins against the (group, value) " +
       "dimension — no per-group raw-row window") {
    val p = plan("q201_rank_normalize")
    // the only Window runs over the AGGREGATED counts (partial+final
    // HashAggregate feed it); the raw documents side hash-joins back
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("percent_rank"), p.take(2000))
  }

  test("q20: exact dedup is slim-rows — no Exchange carries the text " +
       "column, and the winner aggregation is map-side partial") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val exec = SparkEntry.queries("q20_exact_dedup")(spark, sf0001)
      .queryExecution.executedPlan
    val shuffles = exec.collect { case e: ShuffleExchangeLike => e }
    // the winner groupBy shuffles (__xh, __xlen, partial-min id) —
    // never the document text, which this query never re-shuffles at
    // all (the r10 row_number shape exchanged full rows keyed on the
    // content hash, the duplicate-mass skew key)
    shuffles.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"Exchange carries text: $e")
    }
    val p = exec.toString
    assert(p.contains("partial_min") || p.contains("min("), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("exact dedup on a text-retaining pipeline: text shuffles only " +
       "on the uniform id key, never on the content hash") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    // disable broadcast so the semi-join exercises its at-scale
    // shuffle form (winners never broadcast at 100 TB)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
        .select($"doc_id", $"text")
      val exec = graft.llmops.Dedup.exact(docs)
        .queryExecution.executedPlan
      val shuffles = exec.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.nonEmpty)
      val carryingText = shuffles.filter(_.output.exists(_.name == "text"))
      assert(carryingText.nonEmpty) // the one id-keyed exchange
      carryingText.foreach { e =>
        val part = e.outputPartitioning.toString
        assert(part.contains("doc_id") && !part.contains("__xh"),
          s"text shuffled on non-id key: $part")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  // ---- round 11 pins -----------------------------------------------

  test("q209: attribution is one window pass — no events-by-events " +
       "self-join, no sort-merge join anywhere") {
    val p = plan("q209_attribution")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q213: winsorize bands broadcast back — the length table never " +
       "sort-merge-joins") {
    val p = plan("q213_winsorize")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q217: BM25F posting passes are query-term-pruned broadcast " +
       "semi-joins; stats and idf broadcast; no cartesian") {
    val p = plan("q217_bm25f")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q218: multi-probe candidates come from a broadcast bucket " +
       "join; ranking is the bounded-heap aggregate, not a Window") {
    val p = plan("q218_multiprobe_ann")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("collect_top_k") || p.contains("ObjectHashAggregate"),
      p.take(2000))
  }

  test("q219: semantic decontamination broadcasts the benchmark probe " +
       "side — the corpus never re-shuffles for the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val exec = SparkEntry.queries("q219_semantic_decontam")(spark, sf0001)
      .queryExecution.executedPlan
    val p = exec.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // no exchange should carry the corpus embedding vector: the list
    // join is broadcast, so corpus rows stay where the scan put them
    val shuffles = exec.collect { case e: ShuffleExchangeLike => e }
    shuffles.foreach { e =>
      assert(!e.output.exists(_.name == "__cv"),
        s"corpus vectors shuffled: $e") }
  }

  test("q207/q208: iterative graph rounds are checkpoint-cut — the " +
       "executed plan of one round is shallow, not the whole lineage") {
    // labels/frontiers localCheckpoint per round: the final plan must
    // not contain the exploded edge-generator of the base table more
    // than once (lineage O(1), the KCore/ConnectedComponents contract)
    val p7 = plan("q207_label_propagation")
    assert(p7.contains("Scan ExistingRDD") || p7.contains("LocalTableScan"),
      p7.take(2000))
    val p8 = plan("q208_bfs_distances")
    assert(p8.contains("Scan ExistingRDD") || p8.contains("LocalTableScan"),
      p8.take(2000))
  }

  test("q224: phrase search prunes postings by a broadcast term join " +
       "and never substring-scans or builds a cartesian") {
    val p = plan("q224_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Contains"), p.take(2000)) // no substring scan
  }

  test("q225: distinctive terms reduce to slim (group, term) rows — " +
       "group totals broadcast; no cartesian beyond the 1-row stats") {
    val p = plan("q225_distinctive_terms")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q237: PSI binning is a when-chain against broadcast-literal " +
       "edges — the corpus is never globally sorted") {
    val p = plan("q237_psi_drift")
    // the corpus-sized side must not sort; the only Sort allowed is
    // inside the bins-row tail window (10 rows)
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q240: embedding outliers end in TakeOrdered, not a global " +
       "sort; the centroid is a literal (no join back)") {
    val p = plan("q240_embedding_outliers")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q242: streaming-legal PSI is ONE aggregate pair over the " +
       "window — no join, no second shuffle") {
    val p = plan("q242_psi_windows")
    assert(!p.contains("Join"), p.take(2000))
    // partial + final HashAggregate over the window key
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q243: fuzzy matching joins per BLOCK — never a cartesian " +
       "over the name space") {
    val p = plan("q243_fuzzy_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q249: quote detection is the anchor-join shape — shared grams " +
       "only, no pair-space cartesian") {
    val p = plan("q249_quote_spans")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // positions → islands needs exactly one window over the pair key
    assert(p.contains("Window"), p.take(2000))
  }

  test("q253: the chat audit is one narrow projection per " +
       "conversation — no explode, no join, no shuffle above the scan") {
    val p = plan("q253_chat_audit")
    assert(!p.contains("Generate"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
  }

  test("q254: Burrows' Delta's only nested-loop is the broadcast " +
       "vocab-head attach — the token space itself never cartesians") {
    val p = plan("q254_burrows_delta")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the |groups| x k dense grid: BroadcastNestedLoopJoin against the
    // k-row vocab head is the DECLARED shape; anything larger is not
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"expected at most the vocab-grid BNLJ, got " +
      s"$bnlj\n${p.take(2000)}")
  }

  test("q255: split leakage rides the banded LSH tier — no cartesian " +
       "over the corpus, and the split attach is an equi-join") {
    val p = plan("q255_split_leakage")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q251/q258: the labeling statistics shuffle the item stream " +
       "ONCE — the final plan runs on the checkpointed count table, " +
       "never re-scanning parquet per marginal") {
    for (q <- Seq("q251_cohen_kappa", "q258_krippendorff_alpha")) {
      val p = plan(q)
      assert(!p.contains("Scan parquet"),
        s"$q re-reads the input past the lineage cut\n${p.take(2000)}")
    }
  }

  test("q259: ROUGE-L is a narrow map — the LCS kernel runs inside " +
       "the projection, no join, no aggregate, one exchange for the " +
       "output sort only") {
    val p = plan("q259_rouge_l")
    assert(p.contains("lcs_length"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
  }

  test("q261: interval alpha consumes each input row once — one " +
       "item-keyed partial/final aggregate pair, then one-row math; " +
       "no join in the plan at all") {
    val p = plan("q261_alpha_interval")
    assert(!p.contains("Join"), p.take(2000))
    // partial + final for the per-unit agg and for the one-row agg
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }
}
