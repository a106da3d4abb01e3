package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class CohortsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, ms: Long) =
    (id, new Timestamp(ms), user, "view", 1.0)

  test("retention: cohorts by first period, exact counts and rates, " +
      "duplicate activity within a period counted once") {
    // period = 100 ms. u1 first in p0, active p0/p1/p2 (p1 twice);
    // u2 first in p0, active p0 only; u3 first in p1, active p1/p3
    val events = Seq(
      ev(0, 1, 10), ev(1, 1, 110), ev(2, 1, 150), ev(3, 1, 250),
      ev(4, 2, 20),
      ev(5, 3, 130), ev(6, 3, 330)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Cohorts.retention(events, periodMillis = 100)
      .orderBy($"cohort_period", $"period_offset")
      .select($"cohort_period", $"period_offset", $"n_users",
        $"cohort_size", $"retention_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 1.0),   // u1, u2
      (0L, 1L, 1L, 2L, 0.5),   // u1
      (0L, 2L, 1L, 2L, 0.5),   // u1
      (1L, 0L, 1L, 1L, 1.0),   // u3
      (1L, 2L, 1L, 1L, 1.0)    // u3 in p3 = offset 2
    ), s"got=$got")
  }

  test("retention: offset-0 rate is always 1.0; repartition-stable " +
      "on the events table") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val week = 7L * 24 * 3600 * 1000
    val r = Cohorts.retention(events, week).cache()
    assert(r.filter($"period_offset" === 0 && $"retention_rate" =!= 1.0)
      .count() == 0)
    assert(r.filter($"retention_rate" > 1.0).count() == 0)
    val a = r.collect().map(_.toSeq).toSet
    val b = Cohorts.retention(events.repartition(7), week)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
    r.unpersist()
  }
}
