package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // three near-duplicate high-relevance candidates along e1, one
  // distinct medium-relevance candidate along e2
  private def cands(qid: Long) = Seq(
    (qid, 1L, 0.95, Seq(1.0f, 0.01f, 0.0f)),
    (qid, 2L, 0.94, Seq(1.0f, 0.02f, 0.0f)),
    (qid, 3L, 0.93, Seq(1.0f, 0.03f, 0.0f)),
    (qid, 4L, 0.60, Seq(0.0f, 1.0f, 0.0f)))

  test("diversification: the distinct candidate displaces the " +
      "near-duplicates at rank 2") {
    val df = cands(0L).toDF("query_id", "vec_id", "rel", "embedding")
    val picks = Mmr.rerank(df, k = 3, lambda = 0.5)
      .orderBy($"rk").select($"vec_id").as[Long].collect().toSeq
    // pure relevance would give 1, 2, 3; MMR gives 1, then 4 (the
    // near-dups pay ~0.5*1.0 similarity penalty), then a near-dup
    assert(picks.head == 1L)
    assert(picks(1) == 4L, s"picks=$picks")
    assert(Set(2L, 3L).contains(picks(2)))
  }

  test("lambda = 1 reduces to pure relevance ranking") {
    val df = cands(0L).toDF("query_id", "vec_id", "rel", "embedding")
    val picks = Mmr.rerank(df, k = 4, lambda = 1.0)
      .orderBy($"rk").select($"vec_id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 2L, 3L, 4L))
  }

  test("queries are independent; k caps at the candidate count; " +
      "deterministic under repartition") {
    val df = (cands(0L) ++ cands(7L))
      .toDF("query_id", "vec_id", "rel", "embedding")
    val out = Mmr.rerank(df, k = 10, lambda = 0.5)
    assert(out.count() == 8) // 4 per query, k capped
    val perQ = out.groupBy($"query_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perQ == Map(0L -> 4L, 7L -> 4L))
    val a = out.select($"query_id", $"rk", $"vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val b = Mmr.rerank(df.repartition(5), k = 10, lambda = 0.5)
      .select($"query_id", $"rk", $"vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("anti-correlated candidates get a BOOST, not a clamped zero " +
      "penalty (the negative-similarity branch)") {
    val df = Seq(
      (0L, 1L, 0.9, Seq(1.0f, 0.0f)),
      (0L, 2L, 0.10, Seq(-1.0f, 0.0f)), // opposed to pick 1
      (0L, 3L, 0.12, Seq(0.0f, 1.0f))) // orthogonal to pick 1
      .toDF("query_id", "vec_id", "rel", "embedding")
    val out = Mmr.rerank(df, k = 3, lambda = 0.5)
      .orderBy($"rk")
      .select($"vec_id", $"mmr_score").as[(Long, Double)].collect()
    assert(out(0)._1 == 1L)
    // candidate 2: 0.5*0.10 - 0.5*(-1) = 0.55 beats candidate 3's
    // 0.5*0.12 - 0.5*0 = 0.06 — only true if negatives flow through
    assert(out(1)._1 == 2L, s"out=${out.toSeq}")
    assert(math.abs(out(1)._2 - 0.55) < 1e-9)
  }
}
