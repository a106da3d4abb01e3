package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RewriteWindowTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    df.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  private def ruleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.rewriteWindowTopK", "false")
    try body
    finally spark.conf.unset("spark.graft.rewriteWindowTopK")
  }

  // unique ids, duplicate scores (ties broken by id), 7 uneven groups
  private lazy val df = spark.range(0, 2000).select(
    ($"id" % 7).as("g"), $"id",
    (($"id" * 37 % 101).cast("double") / 10).as("score"))

  test("rewrites the scale-trap shape: Window becomes collect_top_k") {
    val opt = windowTopK(df, 5).queryExecution.optimizedPlan
    assert(!opt.toString.contains("Window"), opt.toString)
    assert(opt.toString.contains("collect_top_k"), opt.toString)
    // and the rule-off plan keeps the window, proving the flag works
    ruleOff {
      val off = windowTopK(df, 5).queryExecution.optimizedPlan
      assert(off.toString.contains("Window"), off.toString)
    }
  }

  test("rewritten results are identical to the window plan") {
    val got = windowTopK(df, 5).collect().toSet
    val want = ruleOff(windowTopK(df, 5).collect().toSet)
    assert(got == want)
  }

  test("null scores and short groups match the window's null ordering") {
    // one group smaller than k with null scores: nulls must enter the
    // tail of the top-k in id order, exactly like DESC NULLS LAST
    val nd = spark.range(0, 40).select(
      ($"id" % 2).as("g"), $"id",
      when($"id" % 3 === 0, lit(null))
        .otherwise(($"id" % 4).cast("double")).as("score"))
    val got = windowTopK(nd, 15).collect().toSet
    val want = ruleOff(windowTopK(nd, 15).collect().toSet)
    assert(got == want)
    assert(got.exists(_.isNullAt(2)), "test data must exercise null scores")
  }

  test("residual predicates survive as a filter above the rewrite") {
    val q = windowTopK(df, 3).filter($"g" =!= 2)
    // conjunction form: rk bound + unrelated predicate in one filter
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val q2 = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3 && $"g" =!= 2)
    for (plan <- Seq(q, q2)) {
      val opt = plan.queryExecution.optimizedPlan
      assert(!opt.toString.contains("Window"), opt.toString)
    }
    assert(q2.collect().toSet == ruleOff(q2.collect().toSet))
    assert(!q2.collect().exists(_.getLong(0) == 2))
  }

  test("does not fire on rank(), payload columns, asc order, or big k") {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    // rank() has different tie semantics — must stay a window
    val r1 = df.withColumn("rk", rank().over(w)).filter($"rk" <= 5)
    assert(r1.queryExecution.optimizedPlan.toString.contains("Window"))
    // a payload column the aggregate would drop — must stay a window
    val wide = df.withColumn("payload", $"id" * 2)
    val r2 = wide.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"g", $"payload", $"rk")
    assert(r2.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(r2.collect().toSet == ruleOff(r2.collect().toSet))
    // ascending score is not the similarity-re-rank signature
    val wAsc = Window.partitionBy($"g").orderBy($"score", $"id")
    val r3 = df.withColumn("rk", row_number().over(wAsc)).filter($"rk" <= 5)
    assert(r3.queryExecution.optimizedPlan.toString.contains("Window"))
    // k beyond the buffer guard
    val r4 = windowTopK(df, 100000)
    assert(r4.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("rk < and >= literal forms rewrite too") {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val lt = df.withColumn("rk", row_number().over(w)).filter($"rk" < 6)
    assert(!lt.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(lt.collect().toSet == ruleOff(lt.collect().toSet))
    val ge = df.withColumn("rk", row_number().over(w)).filter(lit(5) >= $"rk")
    assert(!ge.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(ge.collect().toSet == ruleOff(ge.collect().toSet))
  }
}
