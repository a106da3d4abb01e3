package graft

import org.apache.spark.sql.functions._

/** Drives the public facade end-to-end (the "switch to this library"
  * surface): session bootstrap is exercised implicitly via the shared
  * session (same config path), delegation via representative calls.
  */
class GraftFacadeSpec extends SparkTestBase {
  import spark.implicits._

  test("facade: load → dedup → similarity → text analysis round trip") {
    val docs = Graft.documents(spark, sf0001)
    val deduped = Graft.minhashDedup(docs)
    assert(deduped.count() > 0 && deduped.count() <= docs.count())

    val emb = Graft.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    assert(Graft.cosineTopK(emb, q, k = 3).count() == 6)

    val stats = docs.select(
      Graft.langId($"text").as("lang"),
      Graft.tokenCount($"text").as("n"),
      Graft.qualityScore($"text").as("q")).collect()
    assert(stats.forall(r => r.getInt(1) >= 0 && r.getDouble(2) >= 0.0))

    val resolved = Seq(("a.pdf", "https://h.com/x/")).toDF("h", "b")
      .select(Graft.resolveUrl($"h", $"b")).as[String].head()
    assert(resolved == "https://h.com/x/a.pdf")
  }
}
