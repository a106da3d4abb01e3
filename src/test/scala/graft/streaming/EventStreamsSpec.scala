package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("hourlyCounts batch-mode equals a plain group-by") {
    val events = Tables.events(spark, sf0001)
    val got = EventStreams.hourlyCounts(events)
      .select($"window_start", $"event_type", $"n")
    val want = events
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("hourlyCounts runs as a real streaming query with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:45:00")
    val late = java.sql.Timestamp.valueOf("2024-01-01 13:00:00")
    mem.addData((t0, "click", 1.0), (t1, "click", 2.0))
    q.processAllAvailable()
    // advance past watermark so the 10:00 window finalizes
    mem.addData((late, "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("hourly_out")
      .select($"window_start", $"event_type", $"n", $"total_value").collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Timestamp]("window_start") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out.head.getAs[Long]("n") == 2 &&
      out.head.getAs[Double]("total_value") == 3.0)
  }

  test("psiWindows: batch kernel computes per-window PSI against the " +
      "reference; matched window ~0, shifted window large") {
    val t = java.sql.Timestamp.valueOf(_: String)
    // reference: 50/50 around edge 10.0
    val edges = Seq(10.0)
    val ref = Seq(0.5, 0.5)
    // window A matches the reference (2 below, 2 above); window B is
    // fully above the edge
    val events = Seq(
      (t("2024-01-01 10:05:00"), 5.0), (t("2024-01-01 10:10:00"), 7.0),
      (t("2024-01-01 10:20:00"), 15.0), (t("2024-01-01 10:25:00"), 20.0),
      (t("2024-01-01 11:05:00"), 15.0), (t("2024-01-01 11:10:00"), 30.0))
      .toDF("ts", "value")
    val got = EventStreams.psiWindows(events, edges, ref)
      .collect().map(r => r.getAs[java.sql.Timestamp]("window_start")
        -> (r.getAs[Long]("n"), r.getAs[Double]("psi"))).toMap
    assert(got(t("2024-01-01 10:00:00")) == ((4L, 0.0)))
    val (nB, psiB) = got(t("2024-01-01 11:00:00"))
    assert(nB == 2L && psiB > 0.25, s"psi=$psiB")
    // guards: unsorted edges, wrong proportions arity
    intercept[IllegalArgumentException] {
      EventStreams.psiWindows(events, Seq(2.0, 1.0), Seq(0.5, 0.3, 0.2))
    }
    intercept[IllegalArgumentException] {
      EventStreams.psiWindows(events, Seq(1.0), Seq(1.0))
    }
  }

  test("psiWindows streams: append emits finalized windows with the " +
      "same psi the batch kernel computes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val q = EventStreams.psiWindows(df, Seq(10.0), Seq(0.5, 0.5))
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData(
      (t("2024-01-01 10:05:00"), 5.0), (t("2024-01-01 10:10:00"), 15.0),
      (t("2024-01-01 10:20:00"), 25.0), (t("2024-01-01 10:25:00"), 30.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 13:00:00"), 1.0)) // advance watermark
    q.processAllAvailable()
    val out = spark.table("psi_out").collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Timestamp]("window_start") ==
      t("2024-01-01 10:00:00"))
    assert(out.head.getAs[Long]("n") == 4L)
    // batch twin on the same four rows
    val batch = EventStreams.psiWindows(
      Seq((t("2024-01-01 10:05:00"), 5.0), (t("2024-01-01 10:10:00"), 15.0),
        (t("2024-01-01 10:20:00"), 25.0), (t("2024-01-01 10:25:00"), 30.0))
        .toDF("ts", "value"), Seq(10.0), Seq(0.5, 0.5)).head()
    assert(out.head.getAs[Double]("psi") == batch.getAs[Double]("psi"))
  }

  test("windowTopK emits k best per finalized window on a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "event_id", "value")
    val q = EventStreams.windowTopK(df, k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData(
      (t("2024-01-01 10:05:00"), 1L, 5.0),
      (t("2024-01-01 10:10:00"), 2L, 9.0),
      (t("2024-01-01 10:20:00"), 3L, 7.0),
      (t("2024-01-01 10:25:00"), 4L, 1.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 13:00:00"), 9L, 2.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("topk_out")
      .select($"event_id", $"value", $"rk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(out == Set((2L, 9.0, 1), (3L, 7.0, 2))) // top-2 of the 10:00 window
  }

  test("stream-static enrichment joins the broadcast dim per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrichStream(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData((1L, 10.0), (2L, 5.0), (9L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out")
      .select($"user_id", $"tier").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 9L -> None))
  }

  test("streaming dedup within watermark drops repeats, keeps firsts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = EventStreams.dedupStream(df, Seq("user_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:01:00"), 1L),
                (t("2024-01-01 10:02:00"), 2L))
    q.processAllAvailable()
    q.stop()
    val users = spark.table("dedup_out").select($"user_id")
      .as[Long].collect().sorted.toSeq
    assert(users == Seq(1L, 2L))
  }

  test("sessionize merges sessions across micro-batches and closes on timeout") {
    import EventStreams.{Event, Session}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMillis = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def e(id: Long, ts: String, u: Long) =
      Event(id, java.sql.Timestamp.valueOf(ts), u, "click", 1.0)
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime

    // batch 1: open a session for user 1
    mem.addData(e(1, "2024-01-01 10:00:00", 1))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // still open, NOT emitted

    // batch 2: within the gap → must MERGE into the open session, not split
    mem.addData(e(2, "2024-01-01 10:05:00", 1))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0)

    // batch 3: watermark jumps past 10:05+30min → session closes via timeout
    mem.addData(e(3, "2024-01-01 12:00:00", 2))
    q.processAllAvailable()
    val first = spark.table("sess_out").as[Session].collect().toSet
    assert(first == Set(
      Session(1, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 2, 2.0)))

    // batch 4: advance watermark far enough to flush user 2's session
    mem.addData(e(4, "2024-01-01 14:00:00", 3))
    q.processAllAvailable()
    val second = spark.table("sess_out").as[Session].collect().toSet
    q.stop()
    assert(second == Set(
      Session(1, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 2, 2.0),
      Session(2, ms("2024-01-01 12:00:00"), ms("2024-01-01 12:00:00"), 1, 1.0)))
  }

  test("sessionize splits on inactivity gaps") {
    import EventStreams.{Event, Session}
    def e(id: Long, ts: String, u: Long) =
      Event(id, java.sql.Timestamp.valueOf(ts), u, "click", 1.0)
    val events = Seq(
      e(1, "2024-01-01 10:00:00", 1), e(2, "2024-01-01 10:05:00", 1),
      e(3, "2024-01-01 12:00:00", 1),            // new session after 2h gap
      e(4, "2024-01-01 10:00:00", 2)).toDS()
    val sessions = EventStreams.sessionize(events, gapMillis = 30 * 60 * 1000)
      .collect().toSet
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    assert(sessions == Set(
      Session(1, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 2, 2.0),
      Session(1, ms("2024-01-01 12:00:00"), ms("2024-01-01 12:00:00"), 1, 1.0),
      Session(2, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:00:00"), 1, 1.0)))
  }

  test("transitionsStream batch kernel equals the q183 batch matrix") {
    import EventStreams.Event
    val gap = 3600000L
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val kernel = EventStreams.transitionsStream(
        ev.selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[Event], maxGapMillis = gap)
      .groupBy($"prev_type", $"next_type").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.Paths.transitionMatrix(ev, maxGapMillis = gap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kernel.nonEmpty && kernel == batch)
  }

  test("transitionsStream pairs across micro-batches, cuts gaps, " +
      "and expires idle state without changing semantics") {
    import EventStreams.{Event, Transition}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.transitionsStream(mem.toDS(),
        maxGapMillis = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    def e(id: Long, ts: String, u: Long, t: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), u, t, 1.0)

    mem.addData(e(1, "2024-01-01 10:00:00", 1, "view"))
    q.processAllAvailable()
    assert(spark.table("trans_out").count() == 0)

    // batch 2: pairs with the state carried from batch 1
    mem.addData(e(2, "2024-01-01 10:05:00", 1, "click"))
    q.processAllAvailable()
    assert(spark.table("trans_out").as[Transition].collect().toSet ==
      Set(Transition(1, "view", "click", 300000L)))

    // batch 3: a 2 h silence exceeds the gap → NO pair, state replaced
    mem.addData(e(3, "2024-01-01 12:05:00", 1, "purchase"))
    q.processAllAvailable()
    assert(spark.table("trans_out").count() == 1)

    // batch 4: another user far in the future expires user 1's idle
    // state (watermark passes last + gap); then a late-but-in-horizon
    // event for user 1 pairs only if the gap admits it — it doesn't,
    // so expiry was semantics-free
    mem.addData(e(4, "2024-01-02 09:00:00", 2, "view"))
    q.processAllAvailable()
    mem.addData(e(5, "2024-01-02 09:10:00", 2, "click"))
    q.processAllAvailable()
    val got = spark.table("trans_out").as[Transition].collect().toSet
    q.stop()
    assert(got == Set(
      Transition(1, "view", "click", 300000L),
      Transition(2, "view", "click", 600000L)))
  }

  test("attributionStream batch kernel equals the q209 batch picks") {
    import EventStreams.Event
    val lb = 7L * 24 * 3600 * 1000
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val kernel = EventStreams.attributionStream(
        ev.selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[Event], Seq("view", "click"), "purchase", lb)
      .collect()
      .map(r => r.conversion_event_id ->
        (Option(r.first_touch_event_id).map(_.longValue),
         Option(r.last_touch_event_id).map(_.longValue))).toMap
    val batch = graft.ops.Attribution.touches(ev, Seq("view", "click"),
        "purchase", lb)
      .collect()
      .map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(kernel.nonEmpty && kernel == batch)
  }

  test("attributionStream credits at conversion time across " +
      "micro-batches and prunes the lookback buffer") {
    import EventStreams.{Attribution, Event}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.attributionStream(mem.toDS(),
        Seq("view", "click"), "purchase",
        lookbackMillis = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    def e(id: Long, ts: String, u: Long, t: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), u, t, 1.0)

    // touches arrive in one batch, the conversion in a later one
    mem.addData(e(1, "2024-01-01 10:00:00", 1, "view"),
      e(2, "2024-01-01 10:10:00", 1, "click"))
    q.processAllAvailable()
    assert(spark.table("attr_out").count() == 0)
    mem.addData(e(3, "2024-01-01 10:20:00", 1, "purchase"))
    q.processAllAvailable()
    val first = spark.table("attr_out").as[Attribution].head()
    assert(first.first_touch_event_id == 1L &&
      first.last_touch_event_id == 2L)

    // a conversion 31 min after the last touch finds nothing: the
    // buffer pruned both touches out of the lookback
    mem.addData(e(4, "2024-01-01 10:55:00", 1, "purchase"))
    q.processAllAvailable()
    val rows = spark.table("attr_out").as[Attribution].collect()
    q.stop()
    val second = rows.find(_.conversion_event_id == 4L).get
    assert(second.first_touch_event_id == null &&
      second.last_touch_event_id == null, s"$second")
  }
}
