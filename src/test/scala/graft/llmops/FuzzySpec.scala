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

  test("jaroWinklerPairs: overlapping length bands pair an off-by-one " +
      "insertion that straddles a band boundary, exactly once") {
    // 7 chars (bands 1 and 2) vs 8 chars (band 2): the single-band
    // blocking this replaces never even generated the candidate
    val df = Seq((1L, "josephs"), (2L, "josephso")).toDF("doc_id", "name")
    val got = Fuzzy.jaroWinklerPairs(df, threshold = 0.9).collect()
    assert(got.length == 1, got.mkString(", "))
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
  }

  test("jaroWinklerPairs: a hot block is capped whole and the cost is " +
      "observed; cold blocks keep pairing") {
    // 30 rows land in one block (a_1: first char 'a', 4-char names);
    // a single cold m_1 pair must survive the cap untouched
    val hot = (1 to 30).map(i => (i.toLong, f"ax$i%02d"))
    val cold = Seq((100L, "martha"), (101L, "marhta"))
    val df = (hot ++ cold).toDF("doc_id", "name")
    val res = Fuzzy.jaroWinklerPairs(df, threshold = 0.9, maxBlock = 10)
    val got = res.collect()
    assert(got.length == 1, got.mkString(", "))
    assert(got.head.getLong(0) == 100L && got.head.getLong(1) == 101L)
    val m = Dedup.capDropMetrics(res)
    assert(m.size == 1 && m.keys.head.startsWith(Dedup.CapMetricPrefix))
    val (dropped, maxN, seen) = m.values.head
    assert(dropped == 30L && maxN == 30L && seen == 32L,
      s"($dropped, $maxN, $seen)")
    // an ample cap reports zero drops over the same stream
    val calm = Fuzzy.jaroWinklerPairs(df, threshold = 0.9,
      maxBlock = 1000)
    calm.collect()
    assert(Dedup.capDropMetrics(calm).values.head._1 == 0L)
  }

  test("entityClusters: variants collapse to one entity with the " +
      "min-id canonical record; unmatched names stay singletons; " +
      "the output partitions the input") {
    val df = Seq(
      (10L, "martha"), (11L, "marhta"), (12L, "martha"), // one entity
      (20L, "zebra"),                                     // singleton
      (30L, "walrus"), (31L, "walrsu")).toDF("doc_id", "name")
    val got = Fuzzy.entityClusters(df, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(got.keySet == Set(10L, 20L, 30L))
    assert(got(10L) == ((3L, "martha", "10,11,12")))
    assert(got(20L) == ((1L, "zebra", "20")))
    assert(got(30L) == ((2L, "walrus", "30,31")))
    // total partition: member count equals input rows
    assert(got.values.map(_._1).sum == 6L)
  }
}
