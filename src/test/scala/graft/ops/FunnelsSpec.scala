package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class FunnelsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, ms: Long, t: String) =
    (id, new Timestamp(ms), user, t, 1.0)

  test("conversions: strictly-ordered steps, earliest qualifying event " +
      "per step, abandonment leaves a null tail") {
    val events = Seq(
      // u1 converts fully: view@10, click@20 (the @5 click precedes
      // the view and must NOT count), purchase@30
      ev(0, 1, 5, "click"), ev(1, 1, 10, "view"), ev(2, 1, 20, "click"),
      ev(3, 1, 30, "purchase"), ev(4, 1, 25, "click"),
      // u2 abandons after view (purchase without a click in between
      // does not convert step 2)
      ev(5, 2, 10, "view"), ev(6, 2, 40, "purchase"),
      // u3 never views: not in the funnel at all
      ev(7, 3, 10, "click"), ev(8, 3, 20, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Funnels.conversions(events,
        Seq("view", "click", "purchase"))
      .orderBy($"user_id")
      .select($"user_id", $"ts_1", $"ts_2", $"ts_3")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None)), s"got=$got")
  }

  test("funnel summary counts and rates; repartition-stable on the " +
      "events table") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val steps = Seq("view", "click", "purchase")
    val f = Funnels.funnel(events, steps)
      .orderBy($"step")
      .select($"step", $"event_type", $"n_users", $"rate")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(f.map(_._2) == steps)
    // monotone non-increasing, rate anchored at 1.0
    assert(f.head._4 == 1.0)
    assert(f.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    val a = Funnels.conversions(events, steps)
      .collect().map(_.toSeq).toSet
    val b = Funnels.conversions(events.repartition(7), steps)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("conversionLags: closed-form lag stats; abandoned users and " +
      "non-converting steps excluded; exact interpolated percentiles") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // lags A→B in seconds: u1=10, u2=20, u3=40, u4=80 (u5 abandons
    // after A); only u1 completes B→C (lag 5)
    val ev = Seq(
      (1L, "A", ts(0)), (1L, "B", ts(10)), (1L, "C", ts(15)),
      (2L, "A", ts(0)), (2L, "B", ts(20)),
      (3L, "A", ts(0)), (3L, "B", ts(40)),
      (4L, "A", ts(0)), (4L, "B", ts(80)),
      (5L, "A", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnels.conversionLags(ev, Seq("A", "B", "C")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    // step 1: lags ms = 10000, 20000, 40000, 80000
    val (n1, mean1, min1, max1, p50a, p90a) = got(1)
    assert(n1 == 4L && min1 == 10000L && max1 == 80000L)
    assert(mean1 == 37500.0)
    // exact interpolation: p50 = 20000 + 0.5·(40000−20000) = 30000;
    // p90 rank = (4−1)·0.9 = 2.7 → 40000 + 0.7·40000 = 68000
    assert(p50a == 30000.0, s"p50=$p50a")
    assert(math.abs(p90a - 68000.0) < 1e-6, s"p90=$p90a")
    val (n2, mean2, _, _, p50b, _) = got(2)
    assert(n2 == 1L && mean2 == 5000.0 && p50b == 5000.0)
  }
}
