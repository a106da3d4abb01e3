package graft.llmops

import graft.SparkTestBase

class DupSpanSpec extends SparkTestBase {
  import spark.implicits._

  // a shared 4-gram boilerplate span embedded in otherwise-distinct docs
  val boiler = "all rights reserved worldwide"
  lazy val docs = Seq(
    (1L, s"alpha beta gamma $boiler delta epsilon"),
    (2L, s"one two $boiler three four five six"),
    (3L, "completely unique text with no shared spans at all here"),
    (4L, "tiny doc"),
    (5L, s"$boiler") // the span IS the whole doc
  ).toDF("doc_id", "text").cache()

  test("stats find the cross-document span and nothing else") {
    val stats = Dedup.duplicateSpanStats(docs, n = 4, minDocs = 2)
      .orderBy($"doc_id")
      .collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    val byId = stats.map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: 9 tokens, exactly one repeated 4-gram at pos 3 → 4 covered
    assert(byId(1L) == ((9, 1L, 4L, 4.0 / 9)))
    assert(byId(2L) == ((10, 1L, 4L, 0.4)))
    // doc 5 is exactly the span: full coverage
    assert(byId(5L) == ((4, 1L, 4L, 1.0)))
  }

  test("overlapping spans union their covered positions") {
    // "a b c d e" shared by two docs → 4-grams at pos 0 and 1 both
    // duplicated; coverage is 5 positions, not 8
    val d2 = Seq(
      (1L, "a b c d e x y z"),
      (2L, "p q a b c d e r")
    ).toDF("doc_id", "text")
    val stats = Dedup.duplicateSpanStats(d2, n = 4, minDocs = 2)
      .orderBy($"doc_id").collect()
    assert(stats.length == 2)
    assert(stats.forall(_.getLong(2) == 2L), "two dup gram occurrences each")
    assert(stats.forall(_.getLong(3) == 5L), "5 covered positions, unioned")
  }

  test("dropDuplicateSpans removes covered tokens and keeps the rest") {
    val cleaned = Dedup.dropDuplicateSpans(docs, n = 4, minDocs = 2)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "alpha beta gamma delta epsilon")
    assert(cleaned(2L) == "one two three four five six")
    // untouched docs pass through verbatim
    assert(cleaned(3L) == "completely unique text with no shared spans at all here")
    assert(cleaned(4L) == "tiny doc")
    // a doc that was ONLY the span empties out
    assert(cleaned(5L) == "")
  }

  test("minDocs threshold: a 3-doc span survives minDocs = 4") {
    val stats = Dedup.duplicateSpanStats(docs, n = 4, minDocs = 4)
    assert(stats.isEmpty, "no span reaches 4 distinct docs")
  }

  test("pathological long doc: every gram duplicated stays linear") {
    // Two identical 4,000-token docs: every 4-gram is duplicated, so
    // the covered set is the full document — the worst case for the
    // old O(tokens × covered) membership scan (16M comparisons per
    // doc). The linear array_except path handles it instantly; the
    // assertions pin the semantics: full coverage, empty survivors,
    // and a half-covered doc keeps exactly its uncovered suffix in
    // order.
    val longText = (1 to 4000).map(i => s"w${i % 997}").mkString(" ")
    val suffix = (1 to 2000).map(i => s"u$i").mkString(" ")
    val d = Seq(
      (1L, longText), (2L, longText), (3L, s"$longText $suffix")
    ).toDF("doc_id", "text")
    val stats = Dedup.duplicateSpanStats(d, n = 4, minDocs = 2)
      .orderBy($"doc_id").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(stats.take(2).forall(r => r.getDouble(4) == 1.0), "full coverage")
    val cleaned = Dedup.dropDuplicateSpans(d, n = 4, minDocs = 2)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "" && cleaned(2L) == "")
    // doc 3: every gram of the shared prefix (through the one starting
    // 4 from its end) is also in docs 1/2, so the whole prefix is
    // covered; the unique suffix survives in order.
    assert(cleaned(3L) == suffix)
  }
}
