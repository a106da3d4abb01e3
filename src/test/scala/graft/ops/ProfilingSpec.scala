package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("per-column nulls, distinct, min/max from one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), None),
      (3L, None, Some(30)),
      (4L, Some("a"), Some(10))
    ).toDF("id", "s", "v")
    val got = Profiling.profile(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s")._2 == 1L)       // one null
    assert(got("s")._3 == 2L)       // a, b
    assert(got("s")._4 == "a" && got("s")._5 == "b")
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("entirely-null column reports empty min/max and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val row = Profiling.profile(df, Seq("s")).head()
    assert(row.getLong(2) == 2L)    // n_null
    assert(row.getLong(3) == 0L)    // n_distinct_approx
    assert(row.getString(4) == "" && row.getString(5) == "")
  }

  test("single aggregation: the plan has exactly one final HashAggregate pair") {
    val p = Profiling.profile(graft.Tables.orders(spark, sf0001),
      Seq("o_orderstatus", "o_custkey"))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate over the whole table — the
    // per-column stats must not multiply scans
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(p).size <= 2, p.take(2000))
    assert("FileScan|BatchScan".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("estimate tracks exact distinct within 5% on real data") {
    val orders = graft.Tables.orders(spark, sf0001)
    val approx = Profiling.profile(orders, Seq("o_custkey"))
      .select($"n_distinct_approx").as[Long].head()
    val exact = orders.select(countDistinct($"o_custkey")).as[Long].head()
    assert(math.abs(approx - exact) <= exact * 0.05, s"$approx vs $exact")
  }
}
