package graft.ops

import java.sql.Timestamp
import graft.SparkTestBase

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("first/last touch inside the lookback; outside-window touches ignored") {
    val events = Seq(
      (1L, ts(0), 100L, "click"),    // outside a 30-min lookback of :45
      (2L, ts(20), 100L, "view"),    // first in window
      (3L, ts(40), 100L, "click"),   // last in window
      (4L, ts(45), 100L, "purchase"),
      (5L, ts(10), 200L, "purchase") // conversion with no touch at all
    ).toDF("event_id", "ts", "user_id", "event_type")
    val picks = Attribution.touches(events, Seq("view", "click"),
      "purchase", lookbackMillis = 30L * 60 * 1000)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(picks(4L) == (Some(2L), Some(3L)), s"picks=$picks")
    assert(picks(5L) == (None, None))
  }

  test("conversion type overlapping a touch type is forbidden in BOTH " +
      "twins (batch would self-credit, stream would not)") {
    val events = Seq((1L, ts(0), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val eb = intercept[IllegalArgumentException] {
      Attribution.touches(events, Seq("view", "purchase"), "purchase",
        lookbackMillis = 1000L)
    }
    assert(eb.getMessage.contains("must not also be a touch type"))
    val ds = events
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "CAST(1.0 AS DOUBLE) AS value")
      .as[graft.streaming.EventStreams.Event]
    val es = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.attributionStream(ds,
        Seq("view", "purchase"), "purchase", lookbackMillis = 1000L)
    }
    assert(es.getMessage.contains("must not also be a touch type"))
  }

  test("same-millisecond touches break ties on event_id deterministically") {
    val events = Seq(
      (7L, ts(5), 1L, "click"),
      (9L, ts(5), 1L, "view"),   // same instant, higher id
      (10L, ts(6), 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val p = Attribution.touches(events, Seq("view", "click"), "purchase",
      lookbackMillis = 600000).head()
    assert(p.getLong(3) == 7L && p.getLong(4) == 9L,
      s"(first,last)=(${p.get(3)},${p.get(4)})")
  }

  test("report credits channels per model and shares sum to 1") {
    val events = Seq(
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "purchase"),
      (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "view"),
      (6L, ts(3), 2L, "purchase"),
      (7L, ts(3), 3L, "purchase")  // untouched conversion
    ).toDF("event_id", "ts", "user_id", "event_type")
    val rep = Attribution.report(events, Seq("view", "click"), "purchase",
      lookbackMillis = 3600000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(rep(("first", "view"))._1 == 1L)
    assert(rep(("first", "click"))._1 == 1L)
    assert(rep(("last", "click"))._1 == 1L)
    assert(rep(("last", "view"))._1 == 1L)
    assert(rep(("first", "(none)"))._1 == 1L)
    // shares are rounded to 4dp, so three thirds sum to 0.9999
    val firstShares = rep.collect { case (("first", _), (_, s)) => s }.sum
    assert(math.abs(firstShares - 1.0) < 1e-3, s"sum=$firstShares")
  }
}
