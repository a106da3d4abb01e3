package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft_vtable_$tag"
    VersionedTable.drop(spark, root)
    root
  }

  test("publish-while-reading: a reader that resolved v1 keeps seeing " +
      "ONLY v1 rows across a v2 publish; a new resolution sees v2") {
    val root = freshRoot("swap")
    val v1 = VersionedTable.publish(
      (1 to 5).map(i => (i.toLong, "v1")).toDF("id", "tag"), root)
    assert(v1 == 1)
    // reader resolves the pointer NOW — its scan is pinned to v1
    val reader = VersionedTable.readCurrent(spark, root)
    val v2 = VersionedTable.publish(
      (1 to 8).map(i => (i.toLong, "v2")).toDF("id", "tag"), root)
    assert(v2 == 2)
    val seen = reader.select($"tag").distinct().as[String].collect().toSeq
    assert(seen == Seq("v1"), s"reader must stay on its snapshot: $seen")
    assert(reader.count() == 5)
    // a NEW resolution serves v2
    val fresh = VersionedTable.readCurrent(spark, root)
    assert(fresh.count() == 8)
    assert(fresh.select($"tag").distinct().as[String].collect().toSeq ==
      Seq("v2"))
    assert(VersionedTable.currentVersion(spark, root).contains(2))
  }

  test("pinned reads time-travel; unknown version and empty root fail " +
      "with clear messages") {
    val root = freshRoot("pin")
    val e = intercept[IllegalStateException] {
      VersionedTable.readCurrent(spark, root)
    }
    assert(e.getMessage.contains("no published version"))
    VersionedTable.publish(Seq((1L, 10)).toDF("id", "x"), root)
    VersionedTable.publish(Seq((1L, 20)).toDF("id", "x"), root)
    assert(VersionedTable.read(spark, root, 1).head().getInt(1) == 10)
    assert(VersionedTable.read(spark, root, 2).head().getInt(1) == 20)
    val bad = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, 9)
    }
    assert(bad.getMessage.contains("no version"))
  }

  test("diff audits two versions: added/removed/changed/unchanged") {
    val root = freshRoot("diff")
    VersionedTable.publish(Seq(
      (1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"), root)
    VersionedTable.publish(Seq(
      (1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text"), root)
    val st = VersionedTable.diff(spark, root, 1, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("profileDrift: added/removed columns flagged, null-rate moves " +
      "measured on shared columns") {
    val root = freshRoot("drift")
    VersionedTable.publish(Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, None, 30),
      (4L, Some("d"), 40)).toDF("id", "tag", "x"), root)
    VersionedTable.publish(Seq(
      (1L, None: Option[String], true), (2L, None, false),
      (3L, Some("c"), true), (4L, Some("d"), false))
      .toDF("id", "tag", "flag"), root)
    val got = VersionedTable.profileDrift(spark, root, 1, 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "tag", "x", "flag"))
    val x = got("x")
    assert(x.getBoolean(1) && !x.getBoolean(2)) // removed
    assert(x.getDouble(3) == 0.0 && x.isNullAt(4) && x.isNullAt(5))
    val fl = got("flag")
    assert(!fl.getBoolean(1) && fl.getBoolean(2)) // added
    assert(fl.isNullAt(3))
    val tag = got("tag")
    assert(tag.getDouble(3) == 0.25 && tag.getDouble(4) == 0.5)
    assert(tag.getDouble(5) == 0.25) // null-rate delta
  }

  test("prune keeps the newest published versions and never the " +
      "current; pruned versions are gone, kept ones readable") {
    val root = freshRoot("prune")
    (1 to 4).foreach(i =>
      VersionedTable.publish(Seq((i.toLong, i)).toDF("id", "x"), root))
    VersionedTable.prune(spark, root, keep = 2)
    assert(graft.llmops.VersionedIndex.versions(spark, root) == Seq(3, 4))
    assert(VersionedTable.readCurrent(spark, root).head().getInt(1) == 4)
    assert(VersionedTable.read(spark, root, 3).head().getInt(1) == 3)
  }

  test("publishAppend: an append version serves parent rows PLUS the " +
      "appended ones; time travel and lineage resolve the chain; a " +
      "pinned parent read never sees appended rows") {
    val root = freshRoot("append")
    VersionedTable.publish(
      (1 to 5).map(i => (i.toLong, "base")).toDF("id", "tag"), root)
    val v2 = VersionedTable.publishAppend(
      (6 to 8).map(i => (i.toLong, "day2")).toDF("id", "tag"), root)
    assert(v2 == 2)
    val v3 = VersionedTable.publishAppend(
      Seq((9L, "day3")).toDF("id", "tag"), root)
    assert(v3 == 3)
    assert(VersionedTable.lineage(spark, root, 3) == Seq(3, 2, 1))
    assert(VersionedTable.parentOf(spark, root, 1).isEmpty)
    assert(VersionedTable.readCurrent(spark, root).count() == 9)
    // time travel to the middle of the chain: v2 = v1 + day2 only
    assert(VersionedTable.read(spark, root, 2).count() == 8)
    assert(VersionedTable.read(spark, root, 1).count() == 5)
  }

  test("publishAppend: reader isolation holds mid-append; empty root " +
      "and schema drift fail with clear messages") {
    val root = freshRoot("appiso")
    val e = intercept[IllegalStateException] {
      VersionedTable.publishAppend(Seq((1L, "x")).toDF("id", "tag"), root)
    }
    assert(e.getMessage.contains("no published version to append"))
    VersionedTable.publish(
      (1 to 4).map(i => (i.toLong, "base")).toDF("id", "tag"), root)
    val reader = VersionedTable.readCurrent(spark, root)
    VersionedTable.publishAppend(
      Seq((5L, "new")).toDF("id", "tag"), root)
    // the pre-append resolution is pinned: still 4 rows, no "new"
    assert(reader.count() == 4)
    assert(reader.filter($"tag" === "new").count() == 0)
    assert(VersionedTable.readCurrent(spark, root).count() == 5)
    val bad = intercept[IllegalArgumentException] {
      VersionedTable.publishAppend(
        Seq((6L, 42)).toDF("id", "amount"), root)
    }
    assert(bad.getMessage.contains("schema changes need a full publish"))
    // same NAMES but a drifted TYPE must also be rejected BEFORE the
    // pointer flips — id as string would tear the chain at scan time
    val drift = intercept[IllegalArgumentException] {
      VersionedTable.publishAppend(
        Seq(("6", "typed")).toDF("id", "tag"), root)
    }
    assert(drift.getMessage.contains("schema changes need a full publish"))
    assert(drift.getMessage.contains("id:string"), drift.getMessage)
    // nothing torn: the table still reads, still 5 rows
    assert(VersionedTable.readCurrent(spark, root).count() == 5)
  }

  test("prune protects the transitive append parents of kept " +
      "versions; a full publish releases the old chain") {
    val root = freshRoot("apprune")
    VersionedTable.publish(
      (1 to 3).map(i => (i.toLong, i)).toDF("id", "x"), root)     // v1
    VersionedTable.publishAppend(
      Seq((4L, 4)).toDF("id", "x"), root)                          // v2
    VersionedTable.publishAppend(
      Seq((5L, 5)).toDF("id", "x"), root)                          // v3
    // keep=1 would naively delete v1/v2 — but v3 chains to both
    VersionedTable.prune(spark, root, keep = 1)
    assert(graft.llmops.VersionedIndex.versions(spark, root) ==
      Seq(1, 2, 3))
    assert(VersionedTable.readCurrent(spark, root).count() == 5)
    // a FULL publish grounds a new chain; now the old one can go
    VersionedTable.publish(
      (1 to 6).map(i => (i.toLong, i)).toDF("id", "x"), root)     // v4
    VersionedTable.prune(spark, root, keep = 1)
    assert(graft.llmops.VersionedIndex.versions(spark, root) == Seq(4))
    assert(VersionedTable.readCurrent(spark, root).count() == 6)
  }
}
