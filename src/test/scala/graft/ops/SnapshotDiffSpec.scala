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

  test("NULL placement and value-boundary shifts are 'changed', not collisions") {
    // (a, NULL) vs (NULL, a): same non-null content, different columns.
    // (NULL) vs ("") and (NULL) vs ("null"): NULL distinct from any value.
    // ("a b", "c") vs ("a", "b c"): same concatenation, shifted boundary.
    val before = Seq(
      (1L, Option("a"), Option.empty[String]),
      (2L, Option.empty[String], Option("x")),
      (3L, Option.empty[String], Option("x")),
      (4L, Option("a b"), Option("c")))
      .toDF("doc_id", "text", "lang")
    val after = Seq(
      (1L, Option.empty[String], Option("a")),
      (2L, Option(""), Option("x")),
      (3L, Option("null"), Option("x")),
      (4L, Option("a"), Option("b c")))
      .toDF("doc_id", "text", "lang")
    val got = SnapshotDiff.diff(before, after)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "changed",
      3L -> "changed", 4L -> "changed"))
    // and NULL == NULL is still 'unchanged'
    val same = Seq((9L, Option.empty[String], Option("x")))
      .toDF("doc_id", "text", "lang")
    assert(SnapshotDiff.diff(same, same).as[(Long, String)]
      .collect().toMap == Map(9L -> "unchanged"))
  }

  test("identical snapshots are all-unchanged; summary counts add up") {
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
    val d = SnapshotDiff.summary(docs, docs).as[(String, Long)].collect().toMap
    assert(d == Map("unchanged" -> 100L))
  }
}
