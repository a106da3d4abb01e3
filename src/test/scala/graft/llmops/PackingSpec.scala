package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val toy = Seq(
    (1L, 3L), (2L, 5L), (3L, 2L), (4L, 9L), (5L, 1L), (7L, 4L))

  test("hand-computed packing: fragments, offsets, boundaries") {
    // stream (L=4): doc1 [0,3) doc2 [3,8) doc3 [8,10) doc4 [10,19)
    //               doc5 [19,20) doc7 [20,24)
    val frags = Packing.packSequences(toy.toDF("doc_id", "n_toks"),
        seqLen = 4, buckets = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(f => (f._1, f._2))
    val want = Seq(
      (0L, 1L, 0L, 0L, 3L), (0L, 2L, 0L, 3L, 1L), // seq 0: doc1 + doc2
      (1L, 2L, 1L, 0L, 4L),                       // seq 1: doc2
      (2L, 3L, 0L, 0L, 2L), (2L, 4L, 0L, 2L, 2L), // seq 2: doc3 + doc4
      (3L, 4L, 2L, 0L, 4L),                       // seq 3: doc4
      (4L, 4L, 6L, 0L, 3L), (4L, 5L, 0L, 3L, 1L), // seq 4: doc4 tail + doc5
      (5L, 7L, 0L, 0L, 4L))                       // seq 5: doc7
    assert(frags.toSeq == want)
    val stats = Packing.sequenceStats(
        Packing.packSequences(toy.toDF("doc_id", "n_toks"), 4, buckets = 2))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.toSeq == Seq((0L, 2L, 4L, 2L), (1L, 1L, 4L, 0L),
      (2L, 2L, 4L, 2L), (3L, 1L, 4L, 0L), (4L, 2L, 4L, 1L), (5L, 1L, 4L, 1L)))
  }

  test("invariants on real docs: full coverage, exact tiling, no padding") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", TextFuncs.tokenCount($"text").as("n_toks"))
    val frags = Packing.packSequences(docs, seqLen = 128).cache()
    // every kept document fully covered, in order, gap-free
    val perDoc = frags.groupBy($"id")
      .agg(sum($"n_toks").as("covered"), count(lit(1)).as("nf"))
      .join(docs.filter($"n_toks" >= 1), $"id" === $"doc_id")
    assert(perDoc.filter($"covered" =!= $"n_toks").count() == 0)
    assert(perDoc.count() == docs.filter($"n_toks" >= 1).count())
    // every sequence except the last is exactly full; fragments tile
    // it contiguously (sum of lengths = max offset + last length)
    val stats = Packing.sequenceStats(frags)
    val lastSeq = stats.agg(max($"seq_id")).head().getLong(0)
    assert(stats.filter($"seq_id" < lastSeq && $"n_toks" =!= 128).count() == 0)
    val tiled = frags.groupBy($"seq_id").agg(
      sum($"n_toks").as("s"),
      max($"seq_offset" + $"n_toks").as("hi"),
      min($"seq_offset").as("lo"))
    assert(tiled.filter($"lo" =!= 0 || $"hi" =!= $"s").count() == 0)
  }

  test("bucket count never changes results; zero-token docs drop") {
    val docs = (Seq((10L, 0L), (11L, 7L)) ++ toy).toDF("doc_id", "n_toks")
    def run(b: Int) =
      Packing.packSequences(docs, seqLen = 5, buckets = b)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val one = run(1)
    assert(run(3) == one && run(64) == one)
    assert(!one.exists(_._2 == 10L)) // the 0-token doc occupies no span
    assert(one.exists(_._2 == 11L))
    // determinism under physical layout
    val shuffled = Packing.packSequences(docs.repartition(7), 5, buckets = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(shuffled == one)
  }

  // --- coarse stream-sharded binning (packBins) ---

  private def binDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("bin id = floor of the doc's first-token offset / target") {
    // one stream (streams=1): cumulative tokens 3, 6, 9, 12 with
    // target 5 → starts at offsets 0, 3, 6, 9 → bins 0, 0, 1, 1
    val d = binDocs(
      (0L, "s", "a b c"), (1L, "s", "d e f"),
      (2L, "s", "g h i"), (3L, "s", "j k l"))
    val got = Packing.packBins(d, targetTokens = 5, streams = 1)
      .orderBy($"doc_id")
      .select($"doc_id", $"bin_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("streams split the concatenation; assignment is deterministic") {
    val d = binDocs((0L to 19L).map(i =>
      (i, if (i < 10) "a" else "b",
        Seq.fill((i % 4 + 1).toInt)("w").mkString(" "))): _*)
    val p1 = Packing.packBins(d, targetTokens = 4, streams = 4)
    val p2 = Packing.packBins(d.repartition(7), targetTokens = 4, streams = 4)
    // stream = doc_id % streams
    assert(p1.filter($"stream" =!= pmod($"doc_id", lit(4))).count() == 0)
    // identical assignment regardless of input partitioning
    val a1 = p1.select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    val a2 = p2.select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
    val stats = Packing.binStats(p1)
    assert(stats.agg(sum($"n_docs")).as[Long].head() == 20L)
  }

  test("bin token totals cover every token exactly once") {
    val d = binDocs((0L to 9L).map(i => (i, "s", "x y z")): _*)
    val stats = Packing.binStats(
      Packing.packBins(d, targetTokens = 7, streams = 2))
    assert(stats.agg(sum($"bin_tokens")).as[Long].head() == 30L)
  }
}
