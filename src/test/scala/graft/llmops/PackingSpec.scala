package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("bin id = floor of the doc's first-token offset / target") {
    // one stream (streams=1): cumulative tokens 3, 6, 9, 12 with
    // target 5 → starts at offsets 0, 3, 6, 9 → bins 0, 0, 1, 1
    val d = docs(
      (0L, "s", "a b c"), (1L, "s", "d e f"),
      (2L, "s", "g h i"), (3L, "s", "j k l"))
    val got = Packing.packBins(d, targetTokens = 5, streams = 1)
      .orderBy($"doc_id")
      .select($"doc_id", $"bin_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("streams split the concatenation; assignment is deterministic") {
    val d = docs((0L to 19L).map(i =>
      (i, if (i < 10) "a" else "b", Seq.fill((i % 4 + 1).toInt)("w").mkString(" "))): _*)
    val p1 = Packing.packBins(d, targetTokens = 4, streams = 4)
    val p2 = Packing.packBins(d.repartition(7), targetTokens = 4, streams = 4)
    // stream = doc_id % streams
    assert(p1.filter($"stream" =!= pmod($"doc_id", lit(4))).count() == 0)
    // identical assignment regardless of input partitioning
    val a1 = p1.select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    val a2 = p2.select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
    // a doc never lands in a bin beyond its stream's token total / target
    val stats = Packing.binStats(p1)
    assert(stats.agg(sum($"n_docs")).as[Long].head() == 20L)
  }

  test("bin token totals cover every token exactly once") {
    val d = docs((0L to 9L).map(i => (i, "s", "x y z")): _*)
    val stats = Packing.binStats(Packing.packBins(d, targetTokens = 7, streams = 2))
    assert(stats.agg(sum($"bin_tokens")).as[Long].head() == 30L)
  }
}
