package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** RAKE pins: closed-form phrase segmentation + pooled scoring on a
  * hand document, sentence-punctuation boundaries, the
  * maxPhraseWords exclusion (candidates AND stats), duplicate-phrase
  * pooling, degenerate inputs, and repartition stability (the pooled
  * score is one integer division — exact equality holds).
  */
class KeywordsSpec extends SparkTestBase {
  import spark.implicits._

  test("closed-form phrases and pooled scores") {
    // boundaries: "of" (stopword), "systems." (trailing punct)
    // phrases: "deep learning", "deep systems", "learning systems run"
    // deg: deep 4, learning 5, systems 5, run 3; freq: 2,2,2,1
    val docs = Seq((1L,
      "deep learning of deep systems. learning systems run"))
      .toDF("doc_id", "text")
    val got = Keywords.rakeKeywords(docs, k = 5).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "learning systems run", 3L, 13.0 / 5),
      (2, "deep learning", 2L, 9.0 / 4),
      (3, "deep systems", 2L, 9.0 / 4)), s"got=$got")
  }

  test("maxPhraseWords drops long runs from candidates AND stats") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon of alpha beta"))
      .toDF("doc_id", "text")
    // 5-word run excluded at maxPhraseWords=4: only "alpha beta"
    // remains; its words' stats see ONLY the surviving candidate
    val got = Keywords.rakeKeywords(docs, k = 5, maxPhraseWords = 4)
      .collect().map(r => (r.getString(2), r.getDouble(4)))
    assert(got.toSeq == Seq(("alpha beta", 2.0)), s"got=${got.toSeq}")
  }

  test("duplicate phrases pool to one row; empty docs emit none") {
    val docs = Seq(
      (1L, "big data. big data"),
      (2L, "the of and"), // stopwords only → no candidates
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Keywords.rakeKeywords(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(4)))
    // big: freq 2, deg 4; data: freq 2, deg 4 → pooled 8/4 = 2.0
    assert(got.toSeq == Seq((1L, "big data", 2.0)), s"got=${got.toSeq}")
  }

  test("prefixCompletions: per-prefix top-k by frequency then name, " +
      "length cap, case/trim normalization") {
    val log = Seq("spark", "spark", "spark", "Spark sql", "spam",
      "spam", "  spark  ", "rust").toDF("q")
    val got = Keywords.prefixCompletions(log, maxPrefixLen = 3, k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    val byPrefix = got.groupBy(_._1)
    // "sp": spark (4 after normalization) then spam (2)
    assert(byPrefix("sp").sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq(("spark", 4L), ("spam", 2L)))
    // k bounds: "s" has 3 candidates but only 2 rows
    assert(byPrefix("s").length == 2)
    // prefixes stop at maxPrefixLen: no 4-char prefix rows
    assert(got.forall(_._1.length <= 3))
    // "r" → rust
    assert(byPrefix("r").map(_._3).toSeq == Seq("rust"))
  }

  test("top-k bound and repartition-exact on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sf0001)
    val a = Keywords.rakeKeywords(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(4))).toSet
    assert(a.nonEmpty)
    assert(a.groupBy(_._1).values.forall(_.size <= 3))
    val b = Keywords.rakeKeywords(docs.repartition(7), k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(4))).toSet
    assert(a == b)
  }

  test("textrank: hub word connected to everything outranks leaf " +
      "words; deterministic; ties break alphabetically") {
    import spark.implicits._
    // "core" co-occurs with every other word; leaves see only core
    val docs = Seq((1L,
      "core alpha core beta core gamma core delta core epsilon"))
      .toDF("doc_id", "text")
    val got = Keywords.textrankKeywords(docs, k = 3, windowSize = 1,
        iterations = 2)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(got.head == ((1, "core")), s"${got.toSeq}")
    val again = Keywords.textrankKeywords(docs, k = 3, windowSize = 1,
        iterations = 2)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("textrank: per-document graphs stay independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple banana apple"),
      (2L, "xylophone zebra xylophone zebra")
    ).toDF("doc_id", "text")
    val got = Keywords.textrankKeywords(docs, k = 2, windowSize = 1,
        iterations = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    assert(got(1L) == Set("apple", "banana"))
    assert(got(2L) == Set("xylophone", "zebra"))
  }

  test("textrank: short tokens excluded by minLen; empty docs emit " +
      "no rows") {
    import spark.implicits._
    val docs = Seq((1L, "of at by significant tokens only appear"),
      (2L, "")).toDF("doc_id", "text")
    val got = Keywords.textrankKeywords(docs, k = 10, windowSize = 2,
        iterations = 1)
      .collect()
    assert(got.forall(_.getLong(0) == 1L))
    assert(got.forall(_.getString(2).length >= 3))
  }
}
