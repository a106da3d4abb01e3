package graft.llmops

import graft.SparkTestBase

class PhraseSpec extends SparkTestBase {
  import spark.implicits._

  test("phraseMatches: exact adjacency, order-sensitive, " +
      "overlap-counting") {
    val docs = Seq(
      (1L, "big data parallel systems"),
      (2L, "parallel data big systems"),    // same bag, wrong order
      (3L, "data parallel and data parallel again"),
      (4L, "a a a")                          // overlapping phrase
    ).toDF("doc_id", "text")
    val m = Phrase.phraseMatches(docs, Seq("data", "parallel"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 3L -> 2L), s"$m")
    val ov = Phrase.phraseMatches(docs, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov == Map(4L -> 2L), s"overlaps must count: $ov")
  }

  test("phraseTopK ranks by occurrences and keeps token counts") {
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "x y z z z z z z"),
      (3L, "no match here")
    ).toDF("doc_id", "text")
    val top = Phrase.phraseTopK(docs, Seq("x", "y"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((1L, 3L, 6L), (2L, 1L, 8L)), s"${top.toSeq}")
  }

  test("single-term phrase degenerates to term frequency") {
    val docs = Seq((1L, "w w w v")).toDF("doc_id", "text")
    val m = Phrase.phraseMatches(docs, Seq("w")).head()
    assert(m.getLong(1) == 3L)
  }
}
