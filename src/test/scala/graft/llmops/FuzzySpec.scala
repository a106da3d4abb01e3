package graft.llmops

import graft.SparkTestBase

class FuzzySpec extends SparkTestBase {
  import spark.implicits._

  test("jaroWinklerPairs: transposition typos match inside a block; " +
      "different blocks never pair; threshold gates") {
    val df = Seq(
      (1L, "martha"), (2L, "marhta"),     // same block (m_1), jw .9611
      (3L, "zartha"),                      // z-block: never compared to 1/2
      (4L, "mxqwv"),                       // m-block but length band 1
      (5L, "marthaxxxxxxxxxx"),            // m-block, band 4: not compared
      (6L, null.asInstanceOf[String]),
      (7L, "")).toDF("doc_id", "name")
    val pairs = Fuzzy.jaroWinklerPairs(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("jw")))
    assert(pairs.length == 1, pairs.mkString(", "))
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L)
    assert(pairs.head._3 == 0.9611)
    // raising the threshold past the pair's score empties the result
    assert(Fuzzy.jaroWinklerPairs(df, threshold = 0.97).count() == 0)
    // documented blocking limit: a first-char typo escapes the block
    // (jw(martha, nartha) = 0.8889 — above threshold, yet no pair)
    val esc = Seq((1L, "martha"), (2L, "nartha")).toDF("doc_id", "name")
    assert(Fuzzy.jaroWinklerPairs(esc, 0.88).count() == 0)
    // ...and a caller-supplied coarser block key recovers it
    assert(Fuzzy.jaroWinklerPairs(esc, 0.88,
      blockExprSql = "cast(length(name) as string)").count() == 1)
  }
}
