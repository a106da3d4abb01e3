package graft.streaming

import graft.SparkTestBase
import graft.llmops.Freq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed sketch tier's contract: a summary folded across N
  * micro-batches must match the batch aggregate over the union of
  * those batches — exactly for KMV (a deterministic set function) and
  * within the MG guarantees (no overcount, undercount ≤ n/(k+1),
  * heavy-completeness) where decrements make exact equality
  * order-dependent. Same guarantee booleans as the q106/q107 oracles.
  */
class SketchStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def streamBatches(batches: Seq[Seq[(Long, String)]], k: Int)
      : SketchStreams.CorpusSummary = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "item")
    val (summary, writer) = SketchStreams.summarize(
      docs, col("item"), xxhash64(col("item")), k)()
    val q = writer.outputMode("update").start()
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable() // force one micro-batch per addData
    }
    q.stop()
    summary
  }

  test("streamed KMV over N batches equals the batch sketch of the union") {
    val batches = Seq(
      (1 to 40).map(i => (i.toLong, s"item$i")),
      (20 to 70).map(i => (i.toLong, s"item$i")), // overlaps batch 1
      (60 to 90).map(i => (i.toLong, s"item$i")))
    val k = 32
    val streamed = streamBatches(batches, k)
    val union = batches.flatten.toDF("doc_id", "item")
    val batchSketch = union
      .agg(Freq.kmvSketch(xxhash64($"item"), k)).as[Seq[Long]].head()
    assert(streamed.kmv == batchSketch,
      "merged per-batch sketches must BE the union's sketch")
    assert(streamed.n == batches.map(_.size).sum)
  }

  test("streamed MG equals the batch aggregate when k covers the distincts") {
    val batches = Seq(
      Seq.fill(5)((1L, "a")) ++ Seq.fill(2)((2L, "b")),
      Seq.fill(3)((3L, "a")) ++ Seq.fill(4)((4L, "c")))
    val k = 8
    val streamed = streamBatches(batches, k)
    val union = batches.flatten.toDF("doc_id", "item")
    val batchAgg = union.agg(Freq.freqItems($"item", k).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toSeq
    // both are exact below k → identical (a,8),(c,4),(b,2) ordering
    assert(streamed.freq == batchAgg)
    assert(streamed.freq == Seq(("a", 8L), ("c", 4L), ("b", 2L)))
  }

  test("MG guarantees survive cross-batch merges on a skewed stream") {
    // Zipf-ish items split across 3 batches so the driver-side
    // counter-offset merge really fires (distincts 60 >> k 8)
    val rows = (1 to 60).flatMap(j => Seq.fill(600 / j)(j.toString))
    val batches = rows.grouped(rows.size / 3 + 1)
      .map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) }).toSeq
    val k = 8
    val streamed = streamBatches(batches, k)
    val exact = rows.groupBy(identity).map { case (i, v) => (i, v.size.toLong) }
    val bound = streamed.errorBound
    assert(streamed.n == rows.size.toLong)
    streamed.freq.foreach { case (i, e) =>
      assert(e <= exact(i), s"overcount on $i")
      assert(e >= exact(i) - bound, s"undercount beyond n/(k+1) on $i")
    }
    exact.foreach { case (i, ex) =>
      if (ex > bound)
        assert(streamed.freq.exists(_._1 == i),
          s"heavy item $i (count $ex > $bound) missing from merged summary")
    }
  }

  test("per-batch contamination vs a reference corpus sketch") {
    // reference = items 50..149; stream = 1..100 across two batches
    // → true J = |50..100| / |1..149| ≈ 51/149
    val k = 2048 // above every distinct count: estimator is exact
    val reference = (50 to 149).map(i => s"item$i").toDF("item")
      .agg(Freq.kmvSketch(xxhash64($"item"), k)).as[Seq[Long]].head()
    val batches = Seq(
      (1 to 60).map(i => (i.toLong, s"item$i")),
      (61 to 100).map(i => (i.toLong, s"item$i")))
    val streamed = streamBatches(batches, k)
    assert(streamed.jaccardVs(reference) === 51.0 / 149.0)
  }

  test("streamed content digest over N batches equals the batch digest " +
      "of the union, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (digest, writer) = SketchStreams.digestStream(
      docs, Seq("doc_id", "text"), nBuckets = 16)()
    val q = writer.outputMode("update").start()
    val batches = Seq(
      (1 to 40).map(i => (i.toLong, s"doc text $i")),
      (41 to 70).map(i => (i.toLong, s"doc text $i")),
      (71 to 100).map(i => (i.toLong, s"doc text $i")))
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val union = batches.flatten.toDF("doc_id", "text")
    val expected = graft.ops.Profiling.contentDigest(
        union, Seq("doc_id", "text"), nBuckets = 16)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(digest.snapshot == expected)
    // the exactness claim: re-shipped identical content is COUNTED
    // (a digest is a multiset fingerprint, not a dedup)
    val mem2 = MemoryStream[(Long, String)]
    val (d3, w3) = SketchStreams.digestStream(
      mem2.toDF().toDF("doc_id", "text"), Seq("doc_id", "text"),
      nBuckets = 16)()
    val q3 = w3.outputMode("update").start()
    mem2.addData((1L, "x")); q3.processAllAvailable()
    mem2.addData((1L, "x")); q3.processAllAvailable()
    q3.stop()
    assert(d3.snapshot.values.map(_._1).sum == 2L)
    assert(d3.snapshot.values.forall(_._2 == 0L),
      "even multiplicity must cancel the XOR lane, count lane survives")
    // at-least-once replay guard: re-delivering an already-folded
    // batchId must be a no-op (the checkpoint-restart case)
    val before = digest.snapshot
    digest.ingest(0L, Seq((0L, 5L, 123L, 456L)))
    assert(digest.snapshot == before,
      "a replayed batchId corrupted the exact digest")
  }

  test("streamed t-digest over N batches keeps the union's rank " +
    "guarantee; replays are skipped") {
    implicit val sqlCtx = spark.sqlContext
    def mixd(i: Long): Double = {
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (math.abs(z) % 1000000) / 1000000.0
    }
    val batches = Seq.tabulate(4)(b =>
      (0 until 2500).map(i => (i.toLong, mixd(b * 2500L + i))))
    val mem = MemoryStream[(Long, Double)]
    val (rq, writer) = SketchStreams.quantileStream(
      mem.toDF().toDF("doc_id", "v"), col("v"), compression = 100)()
    val q = writer.outputMode("update").start()
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val all = batches.flatten.map(_._2).sorted
    assert(math.abs(rq.n - all.size) < 1e-6)
    assert(rq.snapshot.length <= 200, "fold state unbounded")
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = rq.quantile(p)
      val rank = all.count(_ <= est).toDouble / all.size
      assert(math.abs(rank - p) <= 0.02,
        s"streamed rank error ${math.abs(rank - p)} at q=$p")
    }
    // replay guard: re-folding an already-seen batchId is a no-op
    val before = rq.snapshot
    rq.ingest(0L, Seq((0.5, 1000.0)))
    assert(rq.snapshot == before,
      "a replayed batchId double-counted digest mass")
  }
}
