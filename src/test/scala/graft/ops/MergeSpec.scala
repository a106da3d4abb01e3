package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CDC apply pins: upsert/delete/untouched closed forms, change-wins-
  * at-equal-version (idempotent re-apply), stale changes lose,
  * duplicate-version batches resolve deterministically, delete of an
  * absent key is a no-op, repartition stability.
  */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private val snap = Seq(
    (1L, "a", 10.0, 100L), (2L, "b", 20.0, 100L), (3L, "c", 30.0, 100L)
  ).toDF("id", "name", "bal", "v")

  private def result(changes: org.apache.spark.sql.DataFrame) =
    Merge.applyChanges(snap, changes, Seq("id"), "v").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap

  test("upsert, delete, untouched — and stale changes lose") {
    val ch = Seq(
      (1L, "a2", 11.0, 200L, "u"), // newer upsert wins
      (2L, "b0", 0.0, 50L, "u"),   // STALE: older than snapshot
      (3L, "c", 30.0, 200L, "d"),  // delete
      (9L, "new", 99.0, 200L, "u") // brand-new key
    ).toDF("id", "name", "bal", "v", "op")
    val got = result(ch)
    assert(got == Map(
      1L -> (("a2", 11.0, 200L)),
      2L -> (("b", 20.0, 100L)),
      9L -> (("new", 99.0, 200L))))
  }

  test("re-applying an already-folded batch is a no-op (idempotent)") {
    val ch = Seq((1L, "a2", 11.0, 200L, "u"), (3L, "c", 30.0, 200L, "d"))
      .toDF("id", "name", "bal", "v", "op")
    val once = Merge.applyChanges(snap, ch, Seq("id"), "v")
    val twice = Merge.applyChanges(once, ch, Seq("id"), "v")
    assert(once.collect().map(_.toSeq).toSet ==
      twice.collect().map(_.toSeq).toSet)
  }

  test("delete of an absent key is a no-op; equal-version duplicate " +
      "changes resolve deterministically; repartition-stable") {
    val ch = Seq(
      (7L, "x", 0.0, 500L, "d"),           // key never existed
      (2L, "dupA", 1.0, 300L, "u"),        // same version twice:
      (2L, "dupB", 2.0, 300L, "u")         // full-row tiebreak picks max
    ).toDF("id", "name", "bal", "v", "op")
    val got = result(ch)
    assert(!got.contains(7L))
    assert(got(2L) == (("dupB", 2.0, 300L))) // ("dupB", 2.0) > ("dupA", 1.0)
    val again = Merge.applyChanges(snap.repartition(5),
        ch.repartition(3), Seq("id"), "v").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(again == got)
  }

  test("snapshot carrying an op column is rejected loudly") {
    val bad = snap.withColumn("op", lit("u"))
    val e = intercept[IllegalArgumentException] {
      Merge.applyChanges(bad, snap.withColumn("op", lit("u")),
        Seq("id"), "v")
    }
    assert(e.getMessage.contains("op"))
  }
}
