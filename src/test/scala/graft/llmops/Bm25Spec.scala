package graft.llmops

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "quarterly earnings report revenue growth"),
    (2L, "earnings call transcript earnings earnings"),
    (3L, "cat pictures and dog videos"),
    (4L, "revenue revenue revenue revenue revenue revenue revenue " +
      "revenue revenue revenue earnings and some very long filler " +
      "text to stretch the document length out considerably more"),
    (5L, "annual report"))
  private def docs = corpus.toDF("doc_id", "text")

  test("closed-form check on a tiny corpus") {
    // score doc 1 for query [earnings]: N=5, df=3 (docs 1,2,4),
    // idf = ln(1 + (5-3+0.5)/(3+0.5)) = ln(1 + 2.5/3.5)
    // doc1: tf=1, dl=5, avgdl=(5+5+5+25+2)/5=8.4
    val idf = math.log(1 + 2.5 / 3.5)
    val k1 = 1.2; val b = 0.75
    val denom = 1 + k1 * (1 - b + b * 5.0 / 8.4)
    val expected = idf * (1 * (k1 + 1)) / denom
    val s = Bm25.scores(docs, Seq("earnings"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(math.abs(s(1L) - expected) < 1e-9, s"got ${s(1L)} want $expected")
    assert(!s.contains(3L) && !s.contains(5L), "non-matching docs excluded")
  }

  test("tf saturation: repeated term beats single but sub-linearly") {
    val s = Bm25.scores(docs, Seq("earnings"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // doc2 (tf=3, same dl as doc1) must outrank doc1 (tf=1) but by
    // far less than 3x — the k1 saturation
    assert(s(2L) > s(1L))
    assert(s(2L) < 3 * s(1L))
  }

  test("length normalization: same tf in a longer doc scores lower") {
    val s = Bm25.scores(docs, Seq("earnings"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // doc4 has tf=1 like doc1 but dl 24 vs 5
    assert(s(4L) < s(1L))
  }

  test("multi-term query sums per-term contributions; n_terms_hit counts") {
    val s = Bm25.scores(docs, Seq("earnings", "revenue"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(s(1L)._1 == 2) // both terms
    assert(s(2L)._1 == 1)
    val single = Bm25.scores(docs, Seq("earnings"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(s(1L)._2 > single(1L), "adding a matching term adds score")
  }

  test("topK: k rows, descending, deterministic under repartition") {
    val t1 = Bm25.topK(docs, Seq("earnings", "revenue"), 2)
      .select($"doc_id").as[Long].collect().toSeq
    val t2 = Bm25.topK(docs.repartition(4), Seq("earnings", "revenue"), 2)
      .select($"doc_id").as[Long].collect().toSeq
    assert(t1 == t2)
    assert(t1.size == 2)
  }

  test("query terms are lowercased and deduped; no match = empty") {
    val s = Bm25.scores(docs, Seq("EARNINGS", "earnings"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s(1L) == 1, "dup/case variants collapse to one term")
    assert(Bm25.scores(docs, Seq("zzzzz")).count() == 0)
  }

  test("scoresBatch: every per-query slice is bit-identical to scores") {
    val queries = Seq(
      (0L, "earnings revenue"),
      (1L, "EARNINGS earnings"), // dup/case variants, one term
      (2L, "annual report"),
      (3L, "zzzzz")) // no hits
    val batch = Bm25.scoresBatch(docs, queries.toDF("query_id", "text"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val single = queries.flatMap { case (qid, text) =>
      Bm25.scores(docs, text.split(" ").toSeq).collect()
        .map(r => ((qid, r.getLong(0)), (r.getLong(1), r.getDouble(2))))
    }.toMap
    assert(batch.keySet == single.keySet)
    batch.foreach { case (key, (nth, score)) =>
      assert(single(key)._1 == nth, s"n_terms_hit at $key")
      assert(single(key)._2 == score, s"score at $key") // BIT-identical
    }
  }

  test("topKBatch: per-query top-k matches topK; null queries drop; " +
      "rk is dense from 1") {
    val queries = Seq(
      (Some(0L), Some("earnings revenue")),
      (Some(1L), Some("annual report")),
      (Some(2L), None), // null text: no lexical rows
      (None, Some("earnings"))) // null id: dropped
      .toDF("query_id", "text")
    val batch = Bm25.topKBatch(docs, queries, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(batch.map(_._1).toSet == Set(0L, 1L))
    Seq(0L -> Seq("earnings", "revenue"), 1L -> Seq("annual", "report"))
      .foreach { case (qid, terms) =>
        val want = Bm25.topK(docs, terms, 2).collect()
          .map(r => (r.getLong(0), r.getDouble(2))).toSeq
        val got = batch.filter(_._1 == qid).sortBy(_._2)
          .map(t => (t._3, t._4)).toSeq
        assert(got == want, s"query $qid: got $got want $want")
        assert(batch.filter(_._1 == qid).map(_._2).sorted.toSeq ==
          (1 to got.size).toSeq)
      }
  }

  test("rm3: expansion adds feedback terms, weights form a convex mix, " +
      "and the rescore is deterministic") {
    val corpus = Seq(
      (1L, "earnings report revenue growth dividends guidance"),
      (2L, "earnings call revenue dividends outlook"),
      (3L, "earnings revenue dividends forecast"),
      (4L, "cat pictures and dog videos online"),
      (5L, "weather rainfall wind pressure today"))
      .toDF("doc_id", "text")
    val queries = Seq((0L, "earnings")).toDF("query_id", "text")
    val terms = Bm25.rm3Terms(corpus, queries, fbDocs = 3, fbTerms = 4,
        origWeight = 0.5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    // feedback terms from the earnings docs surface...
    assert(terms.contains("revenue") && terms.contains("dividends"),
      s"terms=$terms")
    // ...and none from the off-topic docs
    assert(!terms.contains("cat") && !terms.contains("rainfall"))
    // convex mix: weights sum to ~1 (orig 0.5 + expansion 0.5)
    assert(math.abs(terms.values.sum - 1.0) < 1e-9, s"sum=${terms.values.sum}")
    // the original term carries at least its orig share
    assert(terms("earnings") >= 0.5 - 1e-9)
    // expanded rescore pulls in docs sharing only FEEDBACK terms
    val hits = Bm25.rm3TopK(corpus, queries, k = 5, fbDocs = 3,
        fbTerms = 4, origWeight = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(hits))
    // deterministic under repartition
    val again = Bm25.rm3TopK(corpus.repartition(5), queries, k = 5,
        fbDocs = 3, fbTerms = 4, origWeight = 0.5)
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toSet
    val first = Bm25.rm3TopK(corpus, queries, k = 5, fbDocs = 3,
        fbTerms = 4, origWeight = 0.5)
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toSet
    assert(again == first)
  }

  test("CJK: unspaced zh docs and an unspaced zh query both tokenize " +
      "to >1 term and retrieve (script-aware seam)") {
    val cjkDocs = Seq(
      (1L, "数据质量很好"), // unspaced zh with 数据
      (2L, "english document about streams"),
      (3L, "测试文档")).toDF("doc_id", "text")
    val queries = Seq((0L, "数据")).toDF("query_id", "text")
    val got = Bm25.topKBatch(cjkDocs, queries, k = 3)
    val rows = got.select($"doc_id", $"n_terms_hit")
      .as[(Long, Long)].collect().toSeq
    // only doc 1 contains 数 and 据; both single-ideograph terms hit
    assert(rows == Seq((1L, 2L)))
  }

  test("decontaminationProbe: min-score gate on the batch ranking") {
    val bench = Seq((10L, "quarterly earnings"), (11L, "cat videos"))
      .toDF("query_id", "text")
    val flagged = Bm25.decontaminationProbe(docs, bench, k = 3,
        minScore = 0.1)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(flagged.contains((10L, 1L))) // both terms hit doc 1
    assert(flagged.contains((11L, 3L))) // cat/videos doc
    assert(!flagged.exists(p => p._1 == 11L && p._2 == 5L))
  }

  test("BM25F: title hits outrank equal body hits; field fold happens " +
      "before saturation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector search", "aaa bbb ccc ddd eee fff"),
      (2L, "aaa bbb", "vector search ccc ddd eee fff"),
      (3L, "zzz yyy", "xxx www vvv uuu ttt sss")
    ).toDF("doc_id", "title", "body")
    val fields = Seq(Bm25.Field("title", 2.0, 0.5),
      Bm25.Field("body", 1.0, 0.75))
    val got = Bm25.scoresFielded(docs, fields, Seq("vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.contains(1L) && got.contains(2L) && !got.contains(3L))
    assert(got(1L) > got(2L),
      s"title hit must outrank body hit: $got")
    // fold-before-saturation: a term in BOTH fields scores less than
    // the sum of two independent per-field BM25 scores would
    val both = Seq((1L, "vector", "vector")).toDF("doc_id", "title", "body")
    val w = Bm25.scoresFielded(both, fields, Seq("vector"))
      .head().getDouble(2)
    val titleOnly = Bm25.scoresFielded(
      Seq((1L, "vector", "")).toDF("doc_id", "title", "body"),
      fields, Seq("vector")).head().getDouble(2)
    assert(w > titleOnly, "second field must still add signal")
  }

  test("BM25F: single equal-weight field reduces toward classic BM25 " +
      "ranking order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector vector window stream aaa bbb"),
      (2L, "vector ccc ddd eee fff ggg"),
      (3L, "hhh iii jjj kkk lll mmm")
    ).toDF("doc_id", "text")
    val classic = Bm25.topK(docs, Seq("vector", "window"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val fielded = Bm25.topKFielded(docs,
        Seq(Bm25.Field("text", 1.0, 0.75)), Seq("vector", "window"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(classic.toSet == fielded.toSet &&
      classic.sorted == fielded.sorted)
  }
}
