package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class MiningSpec extends SparkTestBase {
  import spark.implicits._

  // 4-dim unit-ish vectors with an obvious geometry: queries near the
  // x axis, positives aligned, hard negatives close, easy negatives far
  private def corpus: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // the query itself (positive)
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // positive
    (2L, Array(0.8f, 0.3f, 0.0f, 0.0f)),   // hard negative (closest)
    (3L, Array(0.5f, 0.5f, 0.0f, 0.0f)),   // medium negative
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // orthogonal
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.0f))   // opposite
  ).toDF("vec_id", "embedding")

  private def queries: DataFrame =
    Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("query_id", "embedding")

  private def positives: DataFrame =
    Seq((0L, 0L), (0L, 1L)).toDF("query_id", "vec_id")

  test("hardNegatives: positives never surface, ranks follow cosine " +
      "desc, k bounds the output") {
    val negs = Mining.hardNegatives(corpus, queries, positives, k = 3)
      .orderBy($"neg_rk")
      .select($"neg_rk", $"neg_id").as[(Int, Long)].collect().toSeq
    // 2 (cos≈0.936) > 3 (cos≈0.707) > 4 (0.0); 0 and 1 are positives
    assert(negs == Seq((1, 2L), (2, 3L), (3, 4L)), s"negs=$negs")
  }

  test("hardNegatives: without the self-positive the query's own row " +
      "tops the negatives (the documented caller contract)") {
    val negs = Mining.hardNegatives(corpus, queries,
        Seq((0L, 1L)).toDF("query_id", "vec_id"), k = 2)
      .orderBy($"neg_rk").select($"neg_id").as[Long].collect().toSeq
    assert(negs == Seq(0L, 2L))
  }

  test("contrastiveTriplets: negatives round-robin over positives in " +
      "vec_id order; every negative used exactly once") {
    val negs = Mining.hardNegatives(corpus, queries, positives, k = 3)
    val tri = Mining.contrastiveTriplets(positives, negs)
      .orderBy($"neg_rk")
      .select($"pos_id", $"neg_id", $"neg_rk")
      .as[(Long, Long, Int)].collect().toSeq
    // positives in vec_id order: (0, 1); neg_rk 1→pos 0, 2→pos 1, 3→pos 0
    assert(tri == Seq((0L, 2L, 1), (1L, 3L, 2), (0L, 4L, 3)), s"tri=$tri")
  }

  test("mining is repartition-stable and multi-query") {
    val qs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("query_id", "embedding")
    val ps = Seq((0L, 0L), (1L, 4L)).toDF("query_id", "vec_id")
    val a = Mining.hardNegatives(corpus, qs, ps, k = 2)
      .collect().map(_.toSeq).toSet
    val b = Mining.hardNegatives(corpus.repartition(7), qs, ps, k = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 4) // 2 queries × k=2
  }
}
