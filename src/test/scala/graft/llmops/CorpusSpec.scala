package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val goodText = ("the quick brown fox jumps over a lazy dog and " +
    "keeps running through the field for quite a while longer").trim

  test("stages compose: gate, redact, exact dedup, decontaminate") {
    val docs = Seq(
      (1L, goodText),                            // survives
      (2L, goodText),                            // exact dup of 1 → dropped
      (3L, "x"),                                 // fails quality gate
      (4L, s"contact bob@example.com about $goodText today"), // PII, survives redacted
      (5L, s"$goodText benchmark copy")          // exact benchmark match → dropped
    ).toDF("doc_id", "text")
    // benchmark carries the PII-free text doc 5 will redact to
    val bench = Seq(s"$goodText benchmark copy").toDF("text")

    val out = Corpus.clean(docs, benchmark = Some(bench), minQuality = 0.5)
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    val redacted = out.filter($"doc_id" === 4L)
      .select($"text").as[String].head()
    assert(redacted.contains("<EMAIL>") && !redacted.contains("bob@"))
  }

  test("PII-bearing benchmark doc still decontaminates (same normalization)") {
    val piiText = s"reach alice@example.org regarding $goodText"
    val docs = Seq((1L, piiText), (2L, goodText)).toDF("doc_id", "text")
    val bench = Seq(piiText).toDF("text")
    val kept = Corpus.clean(docs, benchmark = Some(bench), minQuality = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("near-dup cluster stage keeps one representative per cluster") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),       // near-dup of 1
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
      nearDupThreshold = Some(0.7))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("compression gate drops templated docs, keeps prose") {
    val docs = Seq(
      (1L, goodText),
      (2L, "spam " * 120)    // deflate ratio well under 0.2
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
      minCompressionRatio = 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("language filter keeps only the requested language") {
    val en = "the cat and the dog sat in a quiet corner of the house that day"
    val de = "der hund und die katze sind von dem haus mit den kindern gegangen"
    val docs = Seq((1L, en), (2L, de)).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, lang = Some("en"))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
