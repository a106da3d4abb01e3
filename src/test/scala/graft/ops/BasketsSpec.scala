package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BasketsSpec extends SparkTestBase {
  import spark.implicits._

  test("lift > 1 for engineered co-occurrence, < 1 for avoidance") {
    // 10 baskets: a+b always together in 1-5; c in 6-10 (never with a)
    val rows = (1 to 5).flatMap(b =>
      Seq((b.toLong, "a"), (b.toLong, "b"))) ++
      (6 to 10).map(b => (b.toLong, "c")) ++
      Seq((1L, "c")) // one overlap so the (a, c) pair exists at all
    val df = rows.toDF("basket", "item")
    val lifts = Baskets.pairLift(df, col("basket"), "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getDouble(6))).toMap
    // (a, b): together in all 5 of a's baskets: lift = 5*10/(5*5) = 2
    assert(lifts(("a", "b")) == (5L, 2.0), s"$lifts")
    // (a, c): 1 shared basket of 5×6: lift = 1*10/30 = 0.3333
    assert(lifts(("a", "c"))._2 < 0.5)
  }

  test("repeated items in a basket count once (presence semantics)") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y")).toDF("basket", "item")
    val r = Baskets.pairLift(df, col("basket"), "item").head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getDouble(6) == 1.0) // 1 * 1 / (1 * 1)
  }
}
