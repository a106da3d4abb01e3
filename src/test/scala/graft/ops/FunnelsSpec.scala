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
}
