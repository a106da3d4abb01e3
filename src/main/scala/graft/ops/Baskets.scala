package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basket co-occurrence analysis (association lift) over an event
  * log: which event types occur TOGETHER in the same basket more
  * often than independence predicts. The classic market-basket
  * numbers — support, confidence-free symmetric lift — applied to
  * behavioral sessions: lift(view, purchase) ≫ 1 is the signal a
  * funnel exists at all, lift(error, purchase) ≪ 1 quantifies the
  * damage, and at corpus scale the same operator mines tag/topic
  * co-occurrence in document metadata.
  *
  * Shape: baskets are caller-defined (`basket` is any expression —
  * user×hour, session id from [[Sessionize]], a doc id over tags);
  * items collapse to DISTINCT (basket, item) pairs first, so a
  * basket's repeated clicks count once — presence, not frequency,
  * the standard basket semantics. The pair join is a self-join on
  * the basket key where each side is the slim distinct pair frame —
  * per-basket cost is (distinct items per basket choose 2), bounded
  * by the item vocabulary, never by basket event count. Item totals
  * and the basket count broadcast back onto the pair counts: two
  * shuffles total (distinct, pair groupBy) regardless of data size.
  */
object Baskets {

  /** @return (item_a, item_b, n_a, n_b, n_ab, support, lift) with
    *         item_a < item_b; `support` = n_ab / baskets,
    *         `lift` = n_ab·baskets / (n_a·n_b), both rounded to 4dp.
    */
  def pairLift(events: DataFrame, basket: Column,
               itemCol: String = "event_type"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val bi = events.select(basket.as("b"), col(itemCol).as("it"))
      .filter($"b".isNotNull && $"it".isNotNull)
      .distinct().localCheckpoint(true)
    val nBaskets = bi.select($"b").distinct().count()
    val totals = bi.groupBy($"it").agg(count(lit(1)).as("n"))
    val pairs = bi.select($"b", $"it".as("item_a"))
      .join(bi.select($"b", $"it".as("item_b")), Seq("b"))
      .filter($"item_a" < $"item_b")
      .groupBy($"item_a", $"item_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(totals.select($"it".as("item_a"), $"n".as("n_a"))),
        Seq("item_a"))
      .join(broadcast(totals.select($"it".as("item_b"), $"n".as("n_b"))),
        Seq("item_b"))
      .select($"item_a", $"item_b", $"n_a", $"n_b", $"n_ab",
        round($"n_ab" / lit(nBaskets.toDouble), 4).as("support"),
        round($"n_ab" * lit(nBaskets.toDouble) / ($"n_a" * $"n_b"), 4)
          .as("lift"))
  }
}
