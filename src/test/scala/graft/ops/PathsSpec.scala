package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** Transition-matrix pins: closed-form counts and probabilities on a
  * hand stream, the max-gap cut, the (ts, id) tiebreak contract,
  * top-k ordering, and repartition stability (integer counts — exact
  * equality).
  */
class PathsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("closed-form matrix on one user stream") {
    // u1: A→B→B→C ; u2: A→C
    val ev = Seq(
      (1L, 1L, "A", ts(0)), (2L, 1L, "B", ts(10)),
      (3L, 1L, "B", ts(20)), (4L, 1L, "C", ts(30)),
      (5L, 2L, "A", ts(0)), (6L, 2L, "C", ts(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Paths.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("A", "B")) == ((1L, 0.5)))
    assert(got(("A", "C")) == ((1L, 0.5)))
    assert(got(("B", "B")) == ((1L, 0.5)))
    assert(got(("B", "C")) == ((1L, 0.5)))
    assert(got.size == 4) // C is terminal: no row
  }

  test("pairs straddling maxGapMillis are cut") {
    val ev = Seq(
      (1L, 1L, "A", ts(0)), (2L, 1L, "B", ts(100)), // gap 100 s
      (3L, 1L, "C", ts(101))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Paths.transitionMatrix(ev, maxGapMillis = 10000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("B", "C") -> 1L)) // A→B dropped, B→C kept (1 s)
  }

  test("same-timestamp events order by event_id (deterministic pairs)") {
    val ev = Seq(
      (2L, 1L, "B", ts(0)), (1L, 1L, "A", ts(0)), (3L, 1L, "C", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Paths.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "B"), ("B", "C"))) // id order: A then B
  }

  test("topNextEvents ranks by count desc then name, k bounds rows") {
    // from A: →B twice, →C once, →D once
    val ev = Seq(
      (1L, 1L, "A", ts(0)), (2L, 1L, "B", ts(1)),
      (3L, 2L, "A", ts(0)), (4L, 2L, "B", ts(1)),
      (5L, 3L, "A", ts(0)), (6L, 3L, "C", ts(1)),
      (7L, 4L, "A", ts(0)), (8L, 4L, "D", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val top1 = Paths.topNextEvents(ev, 1).collect()
    assert(top1.length == 1 && top1(0).getString(1) == "B")
    val top2 = Paths.topNextEvents(ev, 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(4))).sortBy(_._3)
    // the name tiebreak is INSIDE the rank order, so ranks are unique
    // and exactly k rows survive: C (n=1) beats D (n=1) by name
    assert(top2.map(_._1).toSeq == Seq("B", "C"))
  }

  test("topSessionPaths: session cuts, maxLen truncation, ordered " +
      "paths, deterministic top-k") {
    val ev = Seq(
      // u1 session 1: A B C ; session 2 (after 1h gap): A B
      (1L, 1L, "A", ts(0)), (2L, 1L, "B", ts(10)), (3L, 1L, "C", ts(20)),
      (4L, 1L, "A", ts(4000)), (5L, 1L, "B", ts(4010)),
      // u2: A B (one session)
      (6L, 2L, "A", ts(0)), (7L, 2L, "B", ts(5)),
      // u3: A B C D — truncated to 3 by maxLen
      (8L, 3L, "A", ts(0)), (9L, 3L, "B", ts(1)),
      (10L, 3L, "C", ts(2)), (11L, 3L, "D", ts(3))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Paths.topSessionPaths(ev, gapMillis = 600000L,
        maxLen = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A > B", 2L), ("A > B > C", 2L)), s"got=$got")
    // k bounds output; ordering is (count desc, path asc)
    val top1 = Paths.topSessionPaths(ev, 600000L, maxLen = 3, k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("A > B"))
  }

  test("repartition-stable on the sf0.001 events table") {
    val ev = graft.Tables.events(spark, sf0001)
    val a = Paths.transitionMatrix(ev, maxGapMillis = 3600000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = Paths.transitionMatrix(ev.repartition(7),
        maxGapMillis = 3600000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b && a.nonEmpty)
    // probabilities sum to 1 per antecedent
    val sums = Paths.transitionMatrix(ev).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(3)).sum)
    sums.foreach { case (k, s) => assert(math.abs(s - 1.0) < 1e-9, k) }
  }
}
