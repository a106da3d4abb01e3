package graft

import org.apache.spark.sql.functions._

class RobustnessSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.01).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("every inventory query is deterministic across runs") {
    // the driver hash-compares outputs; any nondeterminism (unstable
    // sort, uncontrolled sampling) breaks the gate silently — catch it
    // here on the cheap SF for a representative mix including sketches
    val picked = Seq("q06_argmax_latest", "q20_exact_dedup",
      "q24_minhash_pairs", "q26_embedding_pairs", "q36_lsh_topk",
      "q43_ivf_topk", "q45_winnow_pairs", "q46_range_join")
    for (name <- picked) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name is nondeterministic")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }
}
