package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed range join equals naive inequality-join semantics") {
    val ev = Tables.events(spark, sf0001).limit(300).cache()
    val gap = 3600L * 1000 * 1000 // 1h in micros
    val got = RangeJoin.timeProximityPairs(ev, Seq("user_id"), "event_id", "ts", gap)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val rows = ev.select($"user_id", $"event_id",
        graft.expr.TimeFuncs.tsMicros($"ts"))
      .as[(Long, Long, Long)].collect()
    val naive = (for {
      a <- rows.iterator
      b <- rows
      if a._1 == b._1 && a._2 < b._2 && math.abs(a._3 - b._3) <= gap
    } yield (a._2, b._2)).toSet
    assert(got == naive,
      s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }

  test("cross-bucket-boundary pairs are caught") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:59:59")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:01") // next bucket, 2s apart
    val df = Seq((1L, 1L, t0), (1L, 2L, t1)).toDF("user_id", "event_id", "ts")
    val got = RangeJoin.timeProximityPairs(df, Seq("user_id"), "event_id", "ts",
      3600L * 1000 * 1000)
    assert(got.count() == 1)
  }

  test("interval-overlap join equals the naive theta-join under " +
    "half-open semantics, once per pair, across bucket widths") {
    val ev = Tables.events(spark, sf0001).limit(400).cache()
    def iv(typ: String) = ev.filter($"event_type" === typ)
      .select($"user_id", $"event_id", $"ts".as("s_ts"),
        timestamp_micros(graft.expr.TimeFuncs.tsMicros($"ts") +
          round($"value" * 60000000L).cast("long")).as("e_ts"))
    val rowsOf = (typ: String) => iv(typ)
      .select($"user_id", $"event_id",
        graft.expr.TimeFuncs.tsMicros($"s_ts"),
        graft.expr.TimeFuncs.tsMicros($"e_ts"))
      .as[(Long, Long, Long, Long)].collect()
    val (la, rb) = (rowsOf("click"), rowsOf("error"))
    val naive = (for {
      a <- la.iterator
      b <- rb
      if a._1 == b._1 && a._4 > a._3 && b._4 > b._3 &&
        a._3 < b._4 && b._3 < a._4
    } yield ((a._2, b._2),
        math.min(a._4, b._4) - math.max(a._3, b._3))).toMap
    // several widths: narrower/wider than typical interval length
    for (w <- Seq(600000000L, 3600000000L, 86400000000L)) {
      val got = RangeJoin.intervalOverlapPairs(
          iv("click"), iv("error"), Seq("user_id"), "event_id",
          "s_ts", "e_ts", bucketMicros = w)
        .select($"id_a", $"id_b", $"overlap_us")
        .as[(Long, Long, Long)].collect()
      assert(got.length == got.map(r => (r._1, r._2)).distinct.length,
        s"duplicate pair rows at width $w")
      assert(got.map(r => ((r._1, r._2), r._3)).toMap == naive,
        s"mismatch at width $w")
    }
  }

  test("interval overlap: touching endpoints and empty intervals " +
    "don't pair (half-open contract)") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val left = Seq((1L, 10L, ts(0), ts(60))).toDF(
      "user_id", "event_id", "s_ts", "e_ts")
    val touching = Seq((1L, 20L, ts(60), ts(120))).toDF(
      "user_id", "event_id", "s_ts", "e_ts")
    val empty = Seq((1L, 30L, ts(30), ts(30))).toDF(
      "user_id", "event_id", "s_ts", "e_ts")
    val overlapping = Seq((1L, 40L, ts(59), ts(61))).toDF(
      "user_id", "event_id", "s_ts", "e_ts")
    def pairs(r: org.apache.spark.sql.DataFrame) =
      RangeJoin.intervalOverlapPairs(left, r, Seq("user_id"),
        "event_id", "s_ts", "e_ts", bucketMicros = 10000000L)
    assert(pairs(touching).count() == 0)
    assert(pairs(empty).count() == 0)
    val got = pairs(overlapping)
      .select($"id_a", $"id_b", $"overlap_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 40L, 1000000L)))
  }
}
