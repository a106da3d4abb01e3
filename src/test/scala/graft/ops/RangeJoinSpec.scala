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
}
