package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-retrieval")
    d.toFile.deleteOnExit()
    d.resolve("idx").toString
  }

  test("buildIndex -> search: questions find their source passages " +
      "through the persisted index alone") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The board raised the quarterly dividend."),
      (2L, "The weather station recorded heavy rainfall. Winds stayed " +
        "calm through the evening. Barometric pressure fell slowly."),
      (3L, "The migration moved the cluster to new hardware. Latency " +
        "dropped after the cache warmup. Throughput doubled at peak."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 128,
      nlist = 4, m = 4)

    // the chunk table landed with composite ids and real text
    val chunks = spark.read.parquet(s"$path/chunks")
    assert(chunks.columns.toSeq ==
      Seq("vec_id", "doc_id", "chunk_idx", "chunk_text"))
    assert(chunks.count() >= 3)
    assert(chunks.filter($"vec_id" =!=
      $"doc_id" * 1000000L + $"chunk_idx").count() == 0)

    // a FRESH search session: everything needed is on disk
    val questions = Seq(
      (0L, "was the dividend raised"),
      (1L, "how much rainfall was recorded"),
      (2L, "what happened to latency"))
      .toDF("query_id", "text")
    val hits = Retrieval.search(spark, path, questions, k = 1,
      nprobe = 4)
    assert(hits.columns.toSeq == Seq("query_id", "rk", "doc_id",
      "chunk_idx", "chunk_text", "sim"))
    val best = hits.filter($"rk" === 1)
      .select($"query_id", $"doc_id").as[(Long, Long)]
      .collect().toMap
    assert(best == Map(0L -> 1L, 1L -> 2L, 2L -> 3L), s"best=$best")
    // the passage text rides along for the consumer
    assert(hits.filter($"rk" === 1 && $"query_id" === 0L)
      .select($"chunk_text").as[String].head()
      .toLowerCase.contains("dividend"))
  }

  test("query id zero cannot collide with chunk vec_id zero") {
    // doc 0 chunk 0 has vec_id 0; a query with id 0 must still be
    // able to retrieve it (the negative-remap guard)
    val docs = Seq(
      (0L, "The annual dividend increase was approved by the board."),
      (1L, "Rainfall and winds dominated the weather report today."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 64,
      nlist = 2, m = 4)
    val hits = Retrieval.search(spark, path,
      Seq((0L, "dividend increase approved")).toDF("query_id", "text"),
      k = 1, nprobe = 2)
    assert(hits.select($"doc_id").as[Long].head() == 0L)
  }
}
