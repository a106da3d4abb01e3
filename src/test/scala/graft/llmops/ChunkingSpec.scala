package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int)
      : Seq[(Int, String, Int)] =
    Chunking.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        window, stride)
      .select($"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq

  test("overlapping windows cover every token with the stride overlap") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, window = 4, stride = 2)
    assert(got == Seq(
      (0, "w1 w2 w3 w4", 4),
      (1, "w3 w4 w5 w6", 4),
      (2, "w5 w6 w7 w8", 4),
      (3, "w7 w8 w9 w10", 4)))
  }

  test("trailing window that repeats covered tokens is suppressed") {
    // 10 tokens, window 8, stride 4: starts 0 and 4 cover 1..10;
    // start 8 would only repeat tokens 9,10 already in chunk 1
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, window = 8, stride = 4)
    assert(got.map(_._1) == Seq(0, 1))
    assert(got(1) == (1, "w5 w6 w7 w8 w9 w10", 6))
  }

  test("short document yields one chunk; whitespace-only yields none") {
    assert(chunksOf("a b", 8, 4) == Seq((0, "a b", 2)))
    assert(chunksOf("   ", 8, 4).isEmpty)
  }

  test("non-overlapping stride == window partitions the tokens") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, window = 3, stride = 3)
    assert(got.map(_._2) == Seq("w1 w2 w3", "w4 w5 w6", "w7 w8 w9"))
    assert(got.map(_._3) == Seq(3, 3, 3))
  }

  test("every token of a corpus sample appears in at least one chunk") {
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    val chunked = Chunking.slidingChunks(docs, windowTokens = 16,
      strideTokens = 8)
    val originalTokens = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val coveredFirst = chunked
      .select($"doc_id", $"n_tokens", $"chunk_idx")
      .groupBy($"doc_id")
      .agg(max($"chunk_idx" * 8 + $"n_tokens").as("last_covered"))
    val joined = originalTokens.join(coveredFirst, "doc_id")
    assert(joined.filter($"last_covered" < $"n").count() == 0)
  }

  test("chunking composes into a stream unchanged (stateless narrow op)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Chunking.slidingChunks(mem.toDF().toDF("doc_id", "text"), 4, 2)
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").start()
    mem.addData((1L, (1 to 6).map("w" + _).mkString(" ")))
    q.processAllAvailable()
    val out = spark.table("chunk_out")
      .select($"chunk_idx", $"chunk_text").as[(Int, String)]
      .collect().sortBy(_._1).toSeq
    q.stop()
    assert(out == Seq((0, "w1 w2 w3 w4"), (1, "w3 w4 w5 w6")))
  }

  test("passthrough columns survive and chunk counts follow the formula") {
    val docs = Seq((1L, "s0", (1 to 20).map("t" + _).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Chunking.slidingChunks(docs, 8, 4)
    assert(got.columns.toSet ==
      Set("doc_id", "source", "chunk_idx", "chunk_text", "n_tokens"))
    // 20 tokens, window 8, stride 4: starts 0,4,8,12 cover through 20;
    // start 16 would end at 24 but previous (12) already reached 20
    assert(got.count() == 4)
    assert(got.select(countDistinct($"source")).as[Long].head() == 1)
  }

  test("sentenceChunks: sentences stay atomic, budget crossings open " +
      "new chunks, reassembly preserves order") {
    // sentence lengths: 10, 10, 26 chars -> +1 separators:
    // before = 0, 11, 22 -> target 20: chunks 0, 0, 1
    val text = "Alpha one. Betas two! Gamma three runs much longer."
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Chunking.sentenceChunks(docs, targetChars = 20)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_text", $"n_sentences")
      .as[(Int, String, Int)].collect().toSeq
    assert(got == Seq(
      (0, "Alpha one. Betas two!", 2),
      (1, "Gamma three runs much longer.", 1)))

    // a huge budget -> one chunk, text reassembled in full
    val one = Chunking.sentenceChunks(docs, targetChars = 10000)
      .select($"chunk_text").as[String].head()
    assert(one == text)

    // a tiny budget -> one chunk per sentence (atomicity: no sentence
    // is ever cut)
    val tiny = Chunking.sentenceChunks(docs, targetChars = 1)
      .orderBy($"chunk_idx").select($"n_sentences").as[Int].collect().toSeq
    assert(tiny == Seq(1, 1, 1))

    // sentence-less doc -> zero chunks
    assert(Chunking.sentenceChunks(
      Seq((2L, "")).toDF("doc_id", "text"), 20).count() == 0)
  }

  test("semanticChunks: a topic switch opens a chunk; same-topic " +
      "sentences stay together; reassembly preserves order") {
    import spark.implicits._
    val topicA = (0 until 3).map(i =>
      s"Alpha beta gamma delta epsilon v$i.").mkString(" ")
    val topicB = (0 until 3).map(i =>
      s"Omega sigma tau upsilon phi w$i.").mkString(" ")
    val docs = Seq((1L, s"$topicA $topicB")).toDF("doc_id", "text")
    val got = Chunking.semanticChunks(docs, dim = 64, minSim = 0.3)
      .orderBy("chunk_idx").collect()
    assert(got.length == 2, s"expected 2 chunks: ${got.toSeq}")
    assert(got(0).getAs[Int]("n_sentences") == 3)
    assert(got(1).getAs[Int]("n_sentences") == 3)
    assert(got(0).getAs[String]("chunk_text").contains("Alpha"))
    assert(!got(0).getAs[String]("chunk_text").contains("Omega"))
    assert(got(1).getAs[String]("chunk_text").startsWith("Omega"))
  }

  test("semanticChunks: one-topic document is one chunk; empty " +
      "document emits nothing; determinism") {
    import spark.implicits._
    val same = (0 until 4).map(i =>
      s"Kappa lambda mu nu xi s$i.").mkString(" ")
    val docs = Seq((1L, same), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.semanticChunks(docs, dim = 64, minSim = 0.3)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    assert(got.head.getAs[Int]("n_sentences") == 4)
    val again = Chunking.semanticChunks(docs, dim = 64, minSim = 0.3)
      .collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
