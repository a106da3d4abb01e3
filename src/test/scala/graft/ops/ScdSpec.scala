package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def obs(user: Long, ms: Long, plan: String, region: String) =
    (user, new Timestamp(ms), plan, region)

  test("intervals: maximal unchanged runs, re-observations compact, " +
      "reverting to an old value opens a NEW interval") {
    val log = Seq(
      obs(1, 1000, "free", "eu"),
      obs(1, 2000, "free", "eu"),   // re-observation: compacts away
      obs(1, 3000, "pro", "eu"),    // plan change
      obs(1, 4000, "free", "eu"),   // revert: must be a NEW run
      obs(2, 1000, "pro", "us")
    ).toDF("user_id", "ts", "plan", "region")
    val got = Scd.intervals(log, "user_id", "ts", Seq("plan", "region"))
      .orderBy($"user_id", $"valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), Option(r.get(4)))).toSeq
    assert(got == Seq(
      (1L, "free", "eu", 1000000L, Some(3000000L)),
      (1L, "pro", "eu", 3000000L, Some(4000000L)),
      (1L, "free", "eu", 4000000L, None),
      (2L, "pro", "us", 1000000L, None)), s"got=$got")
  }

  test("intervals: null attributes compare null-safely; intervals " +
      "tile each key's history; repartition-stable on events") {
    val log = Seq(
      (1L, new Timestamp(1000), null.asInstanceOf[String], "eu"),
      (1L, new Timestamp(2000), null.asInstanceOf[String], "eu"),
      (1L, new Timestamp(3000), "pro", "eu")
    ).toDF("user_id", "ts", "plan", "region")
    val got = Scd.intervals(log, "user_id", "ts", Seq("plan", "region"))
    assert(got.count() == 2) // the two null-plan rows are ONE run
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val iv = Scd.intervals(events, "user_id", "ts", Seq("event_type"))
      .cache()
    // tiling: every valid_to equals the next valid_from (checked by
    // construction of lead) and exactly one open interval per user
    assert(iv.filter($"valid_to".isNull).count() ==
      events.select($"user_id").distinct().count())
    val a = iv.collect().map(_.toSeq).toSet
    val b = Scd.intervals(events.repartition(7), "user_id", "ts",
      Seq("event_type")).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
    iv.unpersist()
  }

  test("lookupJoin: facts pick the covering interval — boundary at " +
      "valid_from inclusive, valid_to exclusive, pre-history null") {
    val log = Seq(
      obs(1, 1000, "free", "eu"),
      obs(1, 3000, "pro", "eu")
    ).toDF("user_id", "ts", "plan", "region")
    val iv = Scd.intervals(log, "user_id", "ts", Seq("plan", "region"))
      .withColumnRenamed("plan", "state_plan")
    val facts = Seq(
      (1L, new Timestamp(500), 10L),   // before history -> null
      (1L, new Timestamp(1000), 11L),  // exactly valid_from -> free
      (1L, new Timestamp(2999), 12L),  // last us of the free run
      (1L, new Timestamp(3000), 13L),  // exactly the switch -> pro
      (1L, new Timestamp(9999), 14L)   // open current interval -> pro
    ).toDF("user_id", "ts", "fact_id")
    val got = Scd.lookupJoin(facts, iv, "user_id", "ts",
        Seq("state_plan"))
      .orderBy($"fact_id")
      .select($"fact_id", $"state_plan")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == Seq(
      (10L, None), (11L, Some("free")), (12L, Some("free")),
      (13L, Some("pro")), (14L, Some("pro"))), s"got=$got")
  }

  test("lookupJoin: a null-attribute interval serves null — the carry " +
      "must not see through it to the previous interval; empty " +
      "same-timestamp intervals never serve") {
    val log = Seq(
      (1L, new Timestamp(1000), "free", "eu"),
      (1L, new Timestamp(3000), null.asInstanceOf[String], "eu")
    ).toDF("user_id", "ts", "plan", "region")
    val iv = Scd.intervals(log, "user_id", "ts", Seq("plan", "region"))
    val facts = Seq((1L, new Timestamp(5000), 1L))
      .toDF("user_id", "ts", "fact_id")
    val got = Scd.lookupJoin(facts, iv, "user_id", "ts",
      Seq("plan", "region")).head()
    assert(got.isNullAt(got.fieldIndex("plan")),
      "null-attr interval must serve null, not the previous plan")
    assert(got.getString(got.fieldIndex("region")) == "eu")
    // two same-timestamp observations open and close an empty
    // interval: the survivor at that instant is the later-ordered run
    val tie = Seq(
      (2L, new Timestamp(1000), "a", "x"),
      (2L, new Timestamp(1000), "b", "x")
    ).toDF("user_id", "ts", "plan", "region")
    val tiv = Scd.intervals(tie, "user_id", "ts", Seq("plan", "region"))
    val tf = Seq((2L, new Timestamp(2000), 9L))
      .toDF("user_id", "ts", "fact_id")
    val plans = (1 to 3).map { _ =>
      Scd.lookupJoin(tf, tiv, "user_id", "ts", Seq("plan"))
        .select($"plan").as[String].head()
    }
    assert(plans.toSet == Set("b"),
      s"empty interval leaked or nondeterminism: $plans")
  }
}
