package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.llmops.AnnIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.collection.mutable

class AnnServeSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("streamed query batches get bit-identical answers to the batch path") {
    val idx = java.nio.file.Files.createTempDirectory("ann-serve").toString
    AnnIndex.write(emb, idx, nlist = 8, coarseIters = 1,
      m = 8, codewords = 16, pqIters = 1)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val queries = mem.toDF().toDF("query_id", "query_vec")

    val answered = mutable.Map.empty[Long, Seq[(Long, Long, Int)]]
    val q = AnnServe.serve(spark, idx, queries, k = 3, nprobe = 3) {
      (res, batchId) =>
        answered(batchId) = res.orderBy($"query_id", $"rk")
          .select($"query_id", $"vec_id", $"rk")
          .as[(Long, Long, Int)].collect().toSeq
    }.start()

    val qvecs = emb.filter($"vec_id" < 4)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq

    mem.addData(qvecs.take(2): _*)
    q.processAllAvailable()
    mem.addData(qvecs.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    assert(answered.size == 2, s"expected 2 served batches: $answered")

    // the batch path over the same per-batch query sets
    def batchAnswer(vs: Seq[(Long, Array[Float])]) =
      AnnIndex.topK(spark, idx,
          vs.toDF("query_id", "query_vec"), k = 3, nprobe = 3)
        .orderBy($"query_id", $"rk")
        .select($"query_id", $"vec_id", $"rk")
        .as[(Long, Long, Int)].collect().toSeq

    val sortedIds = answered.keys.toSeq.sorted
    assert(answered(sortedIds.head) == batchAnswer(qvecs.take(2)))
    assert(answered(sortedIds.last) == batchAnswer(qvecs.drop(2)))
  }

  test("serveHybrid: streamed question batches equal the batch " +
      "hybridSearch over the persisted retrieval index") {
    import graft.llmops.Retrieval
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."),
      (2L, "Rainfall was heavy and winds were calm all evening there."),
      (3L, "The cluster migration halved latency at peak load."))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("hybrid-serve")
      .toString + "/idx"
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 64,
      nlist = 2, m = 4)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val answered = mutable.Map.empty[Long, Set[(Long, Int, Long)]]
    val q = AnnServe.serveHybrid(spark, path,
        mem.toDF().toDF("query_id", "text"), k = 2, nprobe = 2) {
      (res, batchId) =>
        answered(batchId) = res
          .select($"query_id", $"rk", $"doc_id")
          .as[(Long, Int, Long)].collect().toSet
    }.start()
    val batch1 = Seq((0L, "dividend revenue quarter"))
    val batch2 = Seq((1L, "cluster latency"), (2L, "rainfall winds"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    assert(answered.size == 2)
    def batchAnswer(qs: Seq[(Long, String)]) =
      Retrieval.hybridSearch(spark, path,
          qs.toDF("query_id", "text"), k = 2, nprobe = 2)
        .select($"query_id", $"rk", $"doc_id")
        .as[(Long, Int, Long)].collect().toSet
    val ids = answered.keys.toSeq.sorted
    assert(answered(ids.head) == batchAnswer(batch1))
    assert(answered(ids.last) == batchAnswer(batch2))
  }

  test("empty micro-batches are skipped, not served") {
    val idx = java.nio.file.Files.createTempDirectory("ann-serve-empty").toString
    AnnIndex.write(emb, idx, nlist = 4, coarseIters = 0,
      m = 8, codewords = 8, pqIters = 0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val queries = mem.toDF().toDF("query_id", "query_vec")
    var served = 0
    val q = AnnServe.serve(spark, idx, queries, k = 2) { (_, _) => served += 1 }
      .start()
    q.processAllAvailable() // no data yet
    val one = emb.filter($"vec_id" === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    mem.addData(one.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    assert(served == 1, s"expected exactly one non-empty batch served, got $served")
  }

  test("serve on a versioned root picks up a mid-stream publish — new " +
      "vec_ids serve after the version bump without a stream restart") {
    import graft.llmops.VersionedIndex
    val root = java.nio.file.Files.createTempDirectory("ann-serve-ver")
      .toString + "/idx"
    val (v1, _) = AnnIndex.writeVersioned(emb, root, nlist = 4,
      coarseIters = 1, m = 8, codewords = 8, pqIters = 1)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val answered = mutable.Map.empty[Long, Seq[(Long, Long, Int)]]
    val q = AnnServe.serve(spark, root, mem.toDF()
        .toDF("query_id", "query_vec"), k = 3, nprobe = 4) {
      (res, batchId) =>
        answered(batchId) = res.orderBy($"query_id", $"rk")
          .select($"query_id", $"vec_id", $"rk")
          .as[(Long, Long, Int)].collect().toSeq
    }.start()

    val qvecs = emb.filter($"vec_id" < 2)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq
    mem.addData(qvecs: _*)
    q.processAllAvailable()

    // RETRAIN mid-stream: v2 is a disjoint corpus (shifted ids), so
    // every post-bump answer id proves the new version is serving
    val shifted = emb.select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val (v2, _) = AnnIndex.writeVersioned(shifted, root, nlist = 4,
      coarseIters = 1, m = 8, codewords = 8, pqIters = 1)
    assert(v2 > v1)
    mem.addData(qvecs: _*)
    q.processAllAvailable()
    q.stop()

    assert(answered.size == 2, s"expected 2 served batches: $answered")
    def batchAnswer(version: Int) =
      AnnIndex.topK(spark, VersionedIndex.versionPath(root, version),
          qvecs.toDF("query_id", "query_vec"), k = 3, nprobe = 4)
        .orderBy($"query_id", $"rk")
        .select($"query_id", $"vec_id", $"rk")
        .as[(Long, Long, Int)].collect().toSeq
    val ids = answered.keys.toSeq.sorted
    // pre-bump batch ≡ batch path against v1, post-bump ≡ v2
    assert(answered(ids.head) == batchAnswer(v1))
    assert(answered(ids.last) == batchAnswer(v2))
    assert(answered(ids.head).forall(_._2 < 1000L))
    assert(answered(ids.last).nonEmpty &&
      answered(ids.last).forall(_._2 >= 1000L),
      s"post-bump answers must come from the v2 corpus: ${answered(ids.last)}")
  }

  test("serveHybrid on a versioned root refreshes the chunk cache at a " +
      "mid-stream publish — new docs serve without a stream restart") {
    import graft.llmops.Retrieval
    val docsV1 = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."),
      (2L, "Rainfall was heavy and winds were calm all evening there."))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("hybrid-serve-ver")
      .toString + "/idx"
    Retrieval.buildIndexVersioned(docsV1, root, targetChars = 60,
      dim = 64, nlist = 2, m = 4)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val answered = mutable.Map.empty[Long, Set[Long]]
    val q = AnnServe.serveHybrid(spark, root,
        mem.toDF().toDF("query_id", "text"), k = 2, nprobe = 2) {
      (res, batchId) =>
        answered(batchId) = res.select($"doc_id")
          .as[Long].collect().toSet
    }.start()

    val question = Seq((0L, "cluster migration halved latency"))
    mem.addData(question: _*)
    q.processAllAvailable()

    // ingest doc 3 by publishing a rebuilt version mid-stream
    val docsV2 = docsV1.unionByName(Seq(
      (3L, "The cluster migration halved latency at peak load."))
      .toDF("doc_id", "text"))
    Retrieval.buildIndexVersioned(docsV2, root, targetChars = 60,
      dim = 64, nlist = 2, m = 4)
    mem.addData(question: _*)
    q.processAllAvailable()
    q.stop()

    assert(answered.size == 2, s"expected 2 served batches: $answered")
    val ids = answered.keys.toSeq.sorted
    assert(!answered(ids.head).contains(3L),
      s"doc 3 served before it existed: ${answered(ids.head)}")
    assert(answered(ids.last).contains(3L),
      s"post-publish batch must surface doc 3: ${answered(ids.last)}")
  }
}
