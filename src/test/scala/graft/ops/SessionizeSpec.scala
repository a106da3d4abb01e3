package graft.ops

import graft.SparkTestBase
import graft.streaming.EventStreams
import java.sql.Timestamp

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, ms: Long, v: Double) =
    (id, new Timestamp(ms), user, "click", v)

  test("sessions: strictly-greater gap opens a session, equal gap " +
      "does not; stats roll up per session") {
    val events = Seq(
      ev(0, 1, 0, 1.0), ev(1, 1, 1000, 2.0),     // gap == 1000 stays
      ev(2, 1, 2001, 4.0),                        // gap 1001 > 1000 opens
      ev(3, 2, 500, 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.sessions(events, gapMillis = 1000)
      .orderBy($"user_id", $"session_idx")
      .select($"user_id", $"session_idx", $"start_ms", $"end_ms",
        $"n_events", $"total_value")
      .as[(Long, Int, Long, Long, Int, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 0L, 1000L, 2, 3.0),
      (1L, 2, 2001L, 2001L, 1, 4.0),
      (2L, 1, 500L, 500L, 1, 8.0)), s"got=$got")
  }

  test("sessions ≡ the streaming flatMapGroupsWithState kernel on the " +
      "events table") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val gap = 12L * 3600 * 1000
    val batch = Sessionize.sessions(events, gap)
      .select($"user_id", $"start_ms", $"end_ms", $"n_events".cast("long"),
        org.apache.spark.sql.functions.round($"total_value", 4))
      .collect().map(_.toSeq).toSet
    val kernel = EventStreams
      .sessionize(events.as[EventStreams.Event], gap)
      .toDF()
      .select($"user_id", $"start_ms", $"end_ms", $"n_events".cast("long"),
        org.apache.spark.sql.functions.round($"total_value", 4))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && batch == kernel,
      s"batch=${batch.size} kernel=${kernel.size}")
  }

  test("sessions is repartition-stable") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val gap = 12L * 3600 * 1000
    val a = Sessionize.sessions(events, gap).collect().map(_.toSeq).toSet
    val b = Sessionize.sessions(events.repartition(7), gap)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
