package graft.llmops

import graft.SparkTestBase

class ChatSpec extends SparkTestBase {
  import spark.implicits._

  private def j(turns: (String, String)*): String =
    turns.map { case (r, c) =>
      s"""{"role":"$r","content":"$c"}""" }.mkString("[", ",", "]")

  test("transcriptAudit: alternation, opening role, empty turns, and " +
      "per-role char mass; malformed JSON reports parsed=false") {
    val df = Seq(
      (1L, j("user" -> "hi", "assistant" -> "hello", "user" -> "bye")),
      (2L, j("user" -> "a", "user" -> "b", "assistant" -> "c")),
      (3L, j("assistant" -> "opener", "user" -> "reply")),
      (4L, j("user" -> "", "assistant" -> "ok")),
      (5L, "{not json"),
      (6L, j("user" -> "solo")))
      .toDF("convo_id", "convo_json")
    val got = Chat.transcriptAudit(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Boolean]("parsed") && r1.getAs[Int]("n_turns") == 3)
    assert(r1.getAs[Boolean]("starts_with_user") &&
      r1.getAs[Boolean]("alternates"))
    assert(r1.getAs[Int]("n_empty") == 0)
    assert(r1.getAs[Long]("user_chars") == 5L) // "hi" + "bye"
    assert(r1.getAs[Long]("assistant_chars") == 5L)
    // two user turns in a row: alternation broken
    assert(!got(2L).getAs[Boolean]("alternates"))
    assert(got(2L).getAs[Boolean]("starts_with_user"))
    // assistant-first conversation flagged
    assert(!got(3L).getAs[Boolean]("starts_with_user"))
    assert(got(3L).getAs[Boolean]("alternates"))
    // empty content counted
    assert(got(4L).getAs[Int]("n_empty") == 1)
    // malformed JSON: parsed=false, every metric null
    val r5 = got(5L)
    assert(!r5.getAs[Boolean]("parsed"))
    Seq("n_turns", "starts_with_user", "alternates", "n_empty",
      "user_chars", "assistant_chars")
      .foreach(c => assert(r5.isNullAt(r5.fieldIndex(c)), c))
    // a 1-turn conversation alternates vacuously
    assert(got(6L).getAs[Boolean]("alternates"))
    assert(got(6L).getAs[Int]("n_turns") == 1)
  }

  test("transcriptAudit is a stateless projection: it runs under " +
      "readStream in append mode and each micro-batch row equals the " +
      "batch audit of the same transcript") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("convo_id", "convo_json")
    val q = Chat.transcriptAudit(stream)
      .writeStream.format("memory").queryName("chat_audit_out")
      .outputMode("append").start()
    val rows = Seq(
      1L -> j("user" -> "hi", "assistant" -> "yo"),
      2L -> j("user" -> "a", "user" -> "b"),
      3L -> "{broken")
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("chat_audit_out")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val batch = Chat.transcriptAudit(rows.toDF("convo_id", "convo_json"))
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("transcriptAudit round-trips Spark-built JSON (to_json -> " +
      "from_json) without loss") {
    import org.apache.spark.sql.functions._
    val built = Seq(Tuple1(7L)).toDF("convo_id")
      .select($"convo_id", to_json(array(
        struct(lit("user").as("role"), lit("question").as("content")),
        struct(lit("assistant").as("role"), lit("answer").as("content"))))
        .as("convo_json"))
    val r = Chat.transcriptAudit(built).head()
    assert(r.getAs[Boolean]("parsed") && r.getAs[Int]("n_turns") == 2)
    assert(r.getAs[Long]("user_chars") == 8L &&
      r.getAs[Long]("assistant_chars") == 6L)
  }
}
