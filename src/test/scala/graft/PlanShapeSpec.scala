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

  test("q07: rank-window top-k lowers to WindowGroupLimit") {
    // each partition discards rows below rank k BEFORE the shuffle
    assert(plan("q07_topk_per_group").contains("WindowGroupLimit"))
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
    assert(plan("q23_cosine_topk").contains("Window"))
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
}
