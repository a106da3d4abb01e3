package graft.ops

import java.sql.Timestamp
import graft.SparkTestBase

class ExperimentsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, tpe: String) =
    (id, new Timestamp(id * 1000L), user, tpe, 1.0)

  test("abTest: a strong planted effect is significant, no effect is " +
      "not; assignment is deterministic and ~balanced") {
    // 400 users; arm decided by the same hash the operator uses, so
    // we can plant conversion ONLY in arm b
    val users = (0L until 400L)
    val assign = Experiments
    val salt = "exp1"
    val df = users.map(u => (u, "view")).toDF("user_id", "event_type")
    val arms = df.withColumn("arm",
        Experiments.assignArm($"user_id", salt))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val nA = arms.values.count(_ == "a")
    assert(nA > 140 && nA < 260, s"hash split badly unbalanced: $nA")
    // plant: every b-user converts, no a-user does
    val events = users.flatMap { u =>
      val base = Seq((u * 10, "view"))
      if (arms(u) == "b") base :+ (u * 10 + 1, "purchase") else base
    }.map { case (id, tpe) => ev(id, id / 10, tpe) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Experiments.abTest(events, "purchase", salt).head()
    assert(r.getAs[Double]("rate_a") == 0.0)
    assert(r.getAs[Double]("rate_b") == 1.0)
    assert(r.getAs[Boolean]("significant"), s"$r")
    assert(r.getAs[Double]("z") > 10.0)
    // null effect: nobody converts -> z 0, not NaN
    val none = Experiments.abTest(
      users.map(u => ev(u, u, "view"))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      "purchase", salt).head()
    assert(none.getAs[Double]("z") == 0.0)
    assert(!none.getAs[Boolean]("significant"))
  }

  test("abTest: an empty arm still yields the promised single row " +
      "with z 0 and significant false") {
    // hunt a salt under which BOTH test units land in arm 'a'
    val salt = (0 until 1000).map(i => s"s$i").find { s =>
      Seq(100L, 200L).toDF("user_id")
        .select(Experiments.assignArm($"user_id", s).as("arm"))
        .collect().forall(_.getString(0) == "a")
    }.getOrElse(fail("no one-arm salt found in 1000 tries"))
    val events = Seq(ev(1, 100, "purchase"), ev(2, 200, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Experiments.abTest(events, "purchase", salt).collect()
    assert(rows.length == 1, s"expected ONE row, got ${rows.length}")
    val r = rows.head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 0L)
    assert(r.getAs[Long]("conv_a") == 1L && r.getAs[Long]("conv_b") == 0L)
    assert(r.getAs[Double]("rate_b") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
    // fully empty input: still one row, all zeros
    val empty = Experiments.abTest(
      Seq.empty[(Long, Timestamp, Long, String, Double)]
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      "purchase", salt).collect()
    assert(empty.length == 1)
    assert(empty.head.getAs[Long]("n_a") == 0L)
    assert(empty.head.getAs[Double]("z") == 0.0)
  }

  test("abTest: conversion counts each unit once, not each event") {
    val events = Seq(
      ev(1, 100, "purchase"), ev(2, 100, "purchase"),
      ev(3, 100, "purchase"), ev(4, 200, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Experiments.abTest(events, "purchase", "s").head()
    assert(r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == 1L)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 2L)
  }
}
