package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added, removed, changed, unchanged") {
    val before = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    val after = Seq(
      (1L, "alpha", "en"),          // unchanged
      (2L, "beta EDITED", "en"),    // changed
      (4L, "delta", "fr"))          // added; 3 removed
      .toDF("doc_id", "text", "lang")
    val got = SnapshotDiff.diff(before, after)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("value-column subset: changes outside it are invisible") {
    val before = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
    val after = Seq((1L, "a", "de")).toDF("doc_id", "text", "lang")
    val all = SnapshotDiff.diff(before, after).as[(Long, String)].collect().toMap
    val textOnly = SnapshotDiff.diff(before, after, valueCols = Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(all(1L) == "changed" && textOnly(1L) == "unchanged")
  }

  test("identical snapshots are all-unchanged; summary counts add up") {
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
    val d = SnapshotDiff.summary(docs, docs).as[(String, Long)].collect().toMap
    assert(d == Map("unchanged" -> 100L))
  }
}
