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
      "user_chars", "assistant_chars", "other_chars", "n_unknown_role")
      .foreach(c => assert(r5.isNullAt(r5.fieldIndex(c)), c))
    // a 1-turn conversation alternates vacuously
    assert(got(6L).getAs[Boolean]("alternates"))
    assert(got(6L).getAs[Int]("n_turns") == 1)
    // a pure user/assistant convo reports zero unknown-role mass
    assert(got(1L).getAs[Long]("other_chars") == 0L &&
      got(1L).getAs[Int]("n_unknown_role") == 0)
  }

  test("transcriptAudit: a valid empty transcript '[]' audits as " +
      "zero turns (no ANSI element_at failure), and unknown roles " +
      "carry mass in other_chars/n_unknown_role") {
    val df = Seq(
      (1L, "[]"),
      (2L, j("system" -> "be harmless", "user" -> "hi",
        "assistant" -> "hello")),
      (3L, """[{"role":null,"content":"aa"},{"content":"bbb"}]"""),
      (4L, j("user" -> "q", "tool" -> "call", "assistant" -> "a")))
      .toDF("convo_id", "convo_json")
    val got = Chat.transcriptAudit(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Boolean]("parsed") && r1.getAs[Int]("n_turns") == 0)
    assert(!r1.getAs[Boolean]("starts_with_user"))
    assert(r1.getAs[Boolean]("alternates"))
    assert(r1.getAs[Int]("n_empty") == 0 &&
      r1.getAs[Long]("user_chars") == 0L &&
      r1.getAs[Long]("other_chars") == 0L)
    // a system opener: not user-first, and its mass is visible
    val r2 = got(2L)
    assert(!r2.getAs[Boolean]("starts_with_user"))
    assert(r2.getAs[Long]("other_chars") == 11L &&
      r2.getAs[Int]("n_unknown_role") == 1)
    assert(r2.getAs[Boolean]("alternates"))
    // two consecutive null roles = SAME role (null-safe comparison):
    // the alternation gate fires instead of null-propagating
    val r3 = got(3L)
    assert(!r3.getAs[Boolean]("alternates"))
    assert(r3.getAs[Int]("n_unknown_role") == 2 &&
      r3.getAs[Long]("other_chars") == 5L)
    // an interleaved tool turn counts as unknown, not invisible
    val r4 = got(4L)
    assert(r4.getAs[Int]("n_unknown_role") == 1 &&
      r4.getAs[Long]("other_chars") == 4L)
    assert(r4.getAs[Long]("user_chars") == 1L &&
      r4.getAs[Long]("assistant_chars") == 1L)
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
      3L -> "{broken",
      4L -> "[]",
      5L -> j("system" -> "rules", "user" -> "q"))
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("chat_audit_out")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val batch = Chat.transcriptAudit(rows.toDF("convo_id", "convo_json"))
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(streamed == batch)
      assert(streamed.size == 5)
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
