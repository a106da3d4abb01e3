package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("toy LM: counts and add-k scores match hand computation") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    assert(uni.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 2L))
    assert(bi.as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap ==
      Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    // V=2, k=0.5: nll(a,b) = -ln(2.5/3), nll(b,a) = -ln(1.5/3)
    val expected = (2 * math.log(3 / 2.5) + math.log(3 / 1.5)) / 3
    val got = LangModel.nllScores(docs, uni, bi)
      .select($"n_bigrams", $"avg_nll").head()
    assert(got.getLong(0) == 3L)
    assert(math.abs(got.getDouble(1) - expected) < 1e-12)
  }

  test("unseen text hits the smoothing floor ln(V), never infinity") {
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(ref, $"text")
    val bi = LangModel.bigramCounts(ref, $"text")
    val oov = Seq((9L, "x y z")).toDF("doc_id", "text")
    val nll = LangModel.nllScores(oov, uni, bi)
      .select($"avg_nll").head().getDouble(0)
    assert(math.abs(nll - math.log(2.0)) < 1e-12, s"expected ln(V)=ln 2, got $nll")
  }

  test("self-perplexity separates boilerplate from gibberish") {
    val boiler = "the quick brown fox jumps over the lazy dog"
    val docs = ((0L until 20L).map(i => (i, boiler)) :+
      (99L, "zq xv qp wk jx vz pq kx")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    val scores = LangModel.nllScores(docs, uni, bi)
      .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(scores(99L) > scores(0L) + 1.0,
      s"gibberish ${scores(99L)} should far exceed boilerplate ${scores(0L)}")
  }

  test("documents with fewer than 2 tokens produce no score row") {
    val docs = Seq((1L, "ab cd"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    val ids = LangModel.nllScores(docs, uni, bi)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
