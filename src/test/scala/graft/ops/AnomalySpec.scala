package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  // one event per (bucket, i) at bucket*100 + i ms
  private def evs(series: String, bucketCounts: Seq[Int], base: Long = 0)
      : Seq[(Long, Timestamp, Long, String, Double)] =
    bucketCounts.zipWithIndex.flatMap { case (c, b) =>
      (0 until c).map(i =>
        ((b * 1000 + i).toLong + base,
          new Timestamp(b.toLong * 100 + i), 1L, series, 1.0))
    }

  test("changePoint: a clean level shift is found at the exact split; " +
      "ties break earliest; single-bucket series emit nothing") {
    // level 2 for 5 buckets, then level 10 for 5 — split after bucket 4
    val shifted = evs("shift", Seq(2, 2, 2, 2, 2, 10, 10, 10, 10, 10))
    // flat series: all splits score 0 -> earliest bucket wins
    val flat = evs("flat", Seq(3, 3, 3, 3), base = 900000)
    val single = evs("single", Seq(7), base = 1800000)
    val events = (shifted ++ flat ++ single)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Anomaly.changePoint(events, bucketMillis = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("shift")
    assert(s.getAs[Long]("split_bucket") == 4L, s.toString)
    assert(s.getAs[Long]("n_before") == 5L && s.getAs[Long]("n_after") == 5L)
    assert(s.getAs[Double]("mean_before") == 2.0)
    assert(s.getAs[Double]("mean_after") == 10.0)
    // score = 5*5/10 * (2-10)^2 = 160
    assert(s.getAs[Double]("score") == 160.0)
    assert(got("flat").getAs[Long]("split_bucket") == 0L)
    assert(got("flat").getAs[Double]("score") == 0.0)
    assert(!got.contains("single"))
  }

  test("rateAnomalies: a burst against a steady trailing window flags; " +
      "the trailing frame is strictly past-only") {
    // steady 5/bucket for 6 buckets, then a 50-burst
    val events = evs("click", Seq(5, 5, 5, 5, 5, 5, 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Anomaly.rateAnomalies(events, bucketMillis = 100,
        lookback = 6, threshold = 3.0)
      .orderBy($"bucket")
      .select($"bucket", $"n", $"z", $"is_anomaly")
      .collect()
    // buckets 0-2: insufficient history -> z null, never anomalous
    assert(got.take(3).forall(r => r.isNullAt(2) && !r.getBoolean(3)))
    // a perfectly steady series has ZERO trailing variance everywhere
    // -> z null by the guard on every bucket, including the burst
    assert(got.forall(r => r.isNullAt(2) && !r.getBoolean(3)))
    // with variance in the history the burst flags:
    val varied = evs("view", Seq(4, 6, 5, 4, 6, 5, 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = Anomaly.rateAnomalies(varied, bucketMillis = 100,
        lookback = 6, threshold = 3.0)
      .filter($"bucket" === 6).head()
    assert(v.getBoolean(6), s"burst not flagged: $v")
    assert(v.getDouble(5) > 3.0)
    // causality: the burst does not suppress ITS OWN alarm (its own
    // count is excluded from the trailing stats)
    assert(math.abs(v.getDouble(3) - 5.0) < 1e-12) // trail_mean
  }

  test("rateAnomalies: zero-variance history yields null z, not a " +
      "division blowup; repartition-stable on the events table") {
    val flat = evs("err", Seq(5, 5, 5, 5, 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val z = Anomaly.rateAnomalies(flat, 100, lookback = 4,
        minHistory = 2)
      .filter($"bucket" === 4).head()
    assert(z.isNullAt(5) && !z.getBoolean(6))
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val a = Anomaly.rateAnomalies(events, 86400000L, lookback = 7)
      .collect().map(_.toSeq).toSet
    val b = Anomaly.rateAnomalies(events.repartition(7), 86400000L,
      lookback = 7).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("robustRateAnomalies: a spike inside the lookback masks the " +
      "z-score detector but not the median/MAD one") {
    // bucket 4 is a 100-burst; bucket 7 a 30-burst. The trailing
    // window at bucket 7 CONTAINS the 100 — classic masking: stddev
    // blows up, z misses; the median/MAD barely move, robust flags.
    val counts = Seq(10, 12, 14, 11, 100, 11, 12, 30)
    val events = evs("click", counts)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val z = Anomaly.rateAnomalies(events, 100, lookback = 7,
        threshold = 3.0).filter($"bucket" === 7).head()
    assert(!z.getBoolean(6), s"masked z-score unexpectedly flagged: $z")
    val r = Anomaly.robustRateAnomalies(events, 100, lookback = 7,
        threshold = 3.5).filter($"bucket" === 7).head()
    // trailing med 12, MAD 1: z_robust = (30-12)/1.4826 ~ 12.1
    assert(r.getLong(3) == 12L && r.getLong(4) == 1L)
    assert(math.abs(r.getDouble(5) - (30.0 - 12.0) / 1.4826) < 1e-9)
    assert(r.getBoolean(6), s"robust detector missed the burst: $r")
    // ...and the big burst itself still flags
    assert(Anomaly.robustRateAnomalies(events, 100, lookback = 7)
      .filter($"bucket" === 4).head().getBoolean(6))
  }

  test("robustRateAnomalies: null contracts (empty frame, thin " +
      "history, zero MAD) and repartition stability") {
    val events = evs("err", Seq(5, 5, 5, 5, 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Anomaly.robustRateAnomalies(events, 100, lookback = 4,
        minHistory = 3).orderBy($"bucket").collect()
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4)) // no history at all
    assert(rows(1).isNullAt(5)) // 1 bucket < minHistory
    // identical history -> MAD 0 -> null z, never a blowup
    assert(rows(4).getLong(4) == 0L && rows(4).isNullAt(5) &&
      !rows(4).getBoolean(6))
    val real = spark.read.parquet(s"$sf0001/events.parquet")
    val a = Anomaly.robustRateAnomalies(real, 86400000L, lookback = 7)
      .collect().map(_.toSeq).toSet
    val b = Anomaly.robustRateAnomalies(real.repartition(5), 86400000L,
      lookback = 7).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("seasonalRateAnomalies: a weekly cycle hides a burst from the " +
      "plain trailing z but not from same-phase scoring") {
    // 35 daily buckets (bucketMillis = 100): phase-0 spikes at 100,
    // other phases alternate 10/11; day 34 (phase 6) bursts to 30
    def n(d: Int) = if (d % 7 == 0) 100 else if (d == 34) 30
      else 10 + (d % 2)
    val events = evs("a", (0 to 34).map(n))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    val plain = Anomaly.rateAnomalies(events, 100, lookback = 7,
        threshold = 3.0).filter($"bucket" === 34).collect()(0)
    // trailing week mixes the 100-spike into the stddev: z ~0.2
    assert(math.abs(plain.getAs[Double]("z")) < 1.0)
    assert(!plain.getAs[Boolean]("is_anomaly"))

    val seasonal = Anomaly.seasonalRateAnomalies(events, 100, period = 7,
        lookback = 4, threshold = 3.0)
      .filter($"bucket" === 34).collect()(0)
    // same-phase history is 10,11,10,11 → mean 10.5, std .577, z ≈ 34
    assert(seasonal.getAs[Long]("phase") == 6L)
    assert(seasonal.getAs[Double]("z") > 10.0)
    assert(seasonal.getAs[Boolean]("is_anomaly"))
    // and the weekly spikes themselves never alarm seasonally: each
    // phase-0 bucket's history is other 100s
    val spikes = Anomaly.seasonalRateAnomalies(events, 100, period = 7,
        lookback = 4, threshold = 3.0)
      .filter($"phase" === 0).collect()
    assert(spikes.forall(!_.getAs[Boolean]("is_anomaly")))

    val again = Anomaly.seasonalRateAnomalies(
        events.toDF().repartition(5), 100, period = 7, lookback = 4,
        threshold = 3.0).collect().map(_.toSeq).toSet
    val first = Anomaly.seasonalRateAnomalies(events, 100, period = 7,
        lookback = 4, threshold = 3.0).collect().map(_.toSeq).toSet
    assert(first == again)
  }
}
