package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SegmenterSpec extends SparkTestBase {
  import spark.implicits._

  private val dataW = "ข้อมูล" // "data"
  private val revW = "มูลข้อ"  // synthetic decoy: same codepoints, reversed halves
  private val testW = "ทดสอบ"  // "test"
  private val goodW = "ดี"     // "good"
  private val dict = Segmenter.Dictionary(Set(dataW, revW, testW, goodW))

  test("CharLevel is the engine default: bit-identical to the kernel, " +
      "identity reference on Latin") {
    val s = "mixed 数据 text"
    assert(Segmenter.CharLevel.segment(s) ==
      TextFuncs.isolateNoSpaceScriptsJvm(s))
    val latin = "plain latin text"
    assert(Segmenter.CharLevel.segment(latin) eq latin)
  }

  test("Dictionary: greedy longest match, straddling occurrences " +
      "invisible, unknown codepoints fall back to char-level") {
    // the whole text segments into dictionary words
    assert(dict.segment(dataW + testW).trim.split("\\s+").toSeq ==
      Seq(dataW, testW))
    // greedy left-to-right: revW+revW contains dataW straddling the
    // boundary; maximal munch never sees it
    assert(dict.segment(revW + revW).trim.split("\\s+").toSeq ==
      Seq(revW, revW))
    // unknown Thai codepoint between words degrades to a 1-char token
    val unk = "ฯ" // U+0E2F, not in the dictionary
    assert(dict.segment(dataW + unk + goodW).trim.split("\\s+").toSeq ==
      Seq(dataW, unk, goodW))
    // identity (same reference) on text with no no-space codepoints
    val latin = "no thai here"
    assert(dict.segment(latin) eq latin)
    assert(dict.segment(null) == null)
  }

  test("bundled Thai lexicon: loads from the classpath, skips " +
      "comments/blanks, and segments a sentence into dictionary " +
      "words with maximal munch") {
    val thai = Segmenter.BundledThai
    assert(thai.words.size >= 150, s"bundled size ${thai.words.size}")
    assert(!thai.words.exists(_.startsWith("#")))
    // สวัสดีครับผมชอบอาหารไทย → hello + polite particle + I + like +
    // food + Thai; อาหารไทย is not a bundled compound, so maximal
    // munch takes อาหาร then ไทย
    val got = thai.segment("สวัสดีครับผมชอบอาหารไทย")
      .trim.split("\\s+").toSeq
    assert(got == Seq("สวัสดี", "ครับ", "ผม", "ชอบ", "อาหาร", "ไทย"), got)
    // compound preference: ประเทศไทย is bundled whole and must win
    // over ประเทศ + ไทย
    assert(thai.segment("ประเทศไทย").trim.split("\\s+").toSeq ==
      Seq("ประเทศไทย"))
    // a missing resource fails with the path in the message
    val e = intercept[IllegalArgumentException] {
      Segmenter.dictionaryFromResource("/graft/lexicon/nope.txt")
    }
    assert(e.getMessage.contains("/graft/lexicon/nope.txt"))
    // and the lexicon rides through the column path like any
    // Dictionary (codegen reference object)
    import spark.implicits._
    val toks = Seq(Tuple1("ผมชอบกาแฟ")).toDF("text")
      .select(TextFuncs.tokens($"text", thai)).head().getSeq[String](0)
    assert(toks == Seq("ผม", "ชอบ", "กาแฟ"), toks)
  }

  test("tokens(col, seg) runs the segmenter through codegen and " +
      "CharLevel matches the 1-arg overload exactly") {
    val df = Seq((1L, dataW + testW), (2L, revW + revW),
      (3L, "plain latin"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val dictToks = df.select($"id",
        TextFuncs.tokens($"text", dict).as("t"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.toSeq)).toMap
    assert(dictToks(1L) == Some(Seq(dataW, testW)))
    assert(dictToks(2L) == Some(Seq(revW, revW)))
    assert(dictToks(3L) == Some(Seq("plain", "latin")))
    assert(dictToks(4L).isEmpty)
    val a = df.select(TextFuncs.tokens($"text").as("t")).collect().toSeq
    val b = df.select(TextFuncs.tokens($"text", Segmenter.CharLevel)
      .as("t")).collect().toSeq
    assert(a == b)
  }

  test("wordNgrams(col, n, seg) shingles the segmenter's token space") {
    val df = Seq((1L, dataW + testW + goodW)).toDF("id", "text")
    val grams = df.select(
        TextFuncs.wordNgrams($"text", 2, dict).as("g"))
      .head().getSeq[String](0).toSeq
    assert(grams == Seq(s"$dataW $testW", s"$testW $goodW"))
    // default segmenter unchanged: 2-grams over single codepoints
    val charGrams = df.select(
        TextFuncs.wordNgrams($"text", 2).as("g"))
      .head().getSeq[String](0)
    assert(charGrams.forall(_.length == 3)) // "X Y" of 1-char tokens
  }

  test("BM25 ranking flips between segmenters on the planted decoy: " +
      "char-level ranks the codepoint-identical decoy ABOVE the true " +
      "match; the dictionary segmenter drops it") {
    // decoy docs repeat revW (same 6 codepoints as the query word
    // dataW, so char-level sees identical terms at higher tf);
    // true docs contain the actual word dataW once
    val docs = (
      (0 until 10).map(i => (i.toLong, s"filler text number $i about nothing")) ++
      Seq((100L, dataW + testW),          // true match
          (101L, revW + revW + revW))     // decoy, tf 3 per codepoint
    ).toDF("doc_id", "text")
    val queries = Seq((0L, dataW)).toDF("query_id", "text")
    def ranks(seg: Segmenter): Map[Long, Int] =
      Bm25.topKBatch(docs, queries, k = 5, seg = seg)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Int]("rk")).toMap
    val char = ranks(Segmenter.CharLevel)
    val dictR = ranks(dict)
    // char-level: decoy outranks the true match (higher tf, same terms)
    assert(char(101L) < char(100L),
      s"char-level should rank the decoy first: $char")
    // dictionary: the decoy has no query WORD — gone entirely
    assert(dictR.get(101L).isEmpty, s"decoy must vanish: $dictR")
    assert(dictR(100L) == 1)
  }
}
