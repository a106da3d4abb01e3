package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before the left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 99.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0))
      .toDF("user_id", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:00"), "t1"),   // → 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"),   // equal ts → 101.0
      (1L, ts("2024-01-01 10:30:00"), "t3"),   // → 99.0
      (2L, ts("2024-01-01 09:00:00"), "t4"),   // before any quote → null
      (3L, ts("2024-01-01 10:00:00"), "t5"))   // no quotes for key → null
      .toDF("user_id", "tts", "trade_id")

    val got = AsOf.joinAsOf(trades, quotes, Seq("user_id"), "tts", "qts",
      Seq("price"))
      .select($"trade_id", $"price")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(got == Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> Some(99.0),
      "t4" -> None, "t5" -> None))
  }

  test("as-of join agrees with a naive per-row computation on real data") {
    val events = graft.Tables.events(spark, sf0001).limit(300)
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("sts"), $"event_id".as("signup_event"))
    val others = events.filter($"event_type" =!= "signup")
      .select($"user_id", $"ts", $"event_id")

    val got = AsOf.joinAsOf(others, signups, Seq("user_id"), "ts", "sts",
      Seq("signup_event"))
      .select($"event_id", $"signup_event")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val sgn = signups.as[(Long, java.sql.Timestamp, Long)].collect()
    val naive = others.as[(Long, java.sql.Timestamp, Long)].collect().map {
      case (u, t, eid) =>
        val prior = sgn.filter(s => s._1 == u && !s._2.after(t))
        eid -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == naive)

    // forward direction: nearest right row at or AFTER the left time
    val fwd = AsOf.joinAsOf(others, signups, Seq("user_id"), "ts", "sts",
      Seq("signup_event"), forward = true)
      .select($"event_id", $"signup_event")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naiveFwd = others.as[(Long, java.sql.Timestamp, Long)].collect().map {
      case (u, t, eid) =>
        val later = sgn.filter(s => s._1 == u && !s._2.before(t))
        eid -> (if (later.isEmpty) None else Some(later.minBy(_._2.getTime)._3))
    }.toMap
    assert(fwd == naiveFwd)
  }
}
