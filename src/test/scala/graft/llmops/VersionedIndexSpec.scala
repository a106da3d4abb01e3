package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The serve-under-maintenance contract: maintenance writes a fresh
  * immutable version and flips an atomic pointer, so a serve that
  * resolved the pointer BEFORE the maintenance op (= a serve racing
  * it) finishes against intact files, bit-exactly — never torn state.
  */
class VersionedIndexSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)
    .select($"doc_id", $"text").cache()
  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  lazy val annQ = emb.filter($"vec_id" < 5)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
  private val queries = Seq(
    (0L, "vector window merge"), (1L, "stream window"))
    .toDF("query_id", "text")

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-vidx")
    d.toFile.deleteOnExit()
    d.resolve("root").toString
  }

  test("pointer mechanics: no current before publish; publish flips; " +
      "next skips unpublished partial dirs; prune never deletes the " +
      "current version") {
    val root = tmp()
    assert(VersionedIndex.current(spark, root).isEmpty)
    intercept[IllegalStateException] {
      VersionedIndex.currentPath(spark, root)
    }
    assert(VersionedIndex.next(spark, root) == 1)
    // a crashed, unpublished write leaves a dir: it must be skipped
    Seq(1).toDF("x").write.parquet(
      VersionedIndex.versionPath(root, 1) + "/marker")
    assert(VersionedIndex.current(spark, root).isEmpty)
    assert(VersionedIndex.next(spark, root) == 2)
    intercept[IllegalArgumentException] {
      VersionedIndex.publish(spark, root, 2) // dir does not exist yet
    }
    VersionedIndex.publish(spark, root, 1)
    assert(VersionedIndex.current(spark, root).contains(1))
    Seq(2).toDF("x").write.parquet(
      VersionedIndex.versionPath(root, 2) + "/marker")
    VersionedIndex.publish(spark, root, 2)
    assert(VersionedIndex.current(spark, root).contains(2))
    assert(VersionedIndex.versions(spark, root) == Seq(1, 2))
    VersionedIndex.prune(spark, root, keep = 1)
    assert(VersionedIndex.versions(spark, root) == Seq(2))
    // current survives prune even at keep = 1 with later partial dirs
    Seq(3).toDF("x").write.parquet(
      VersionedIndex.versionPath(root, 3) + "/marker")
    VersionedIndex.prune(spark, root, keep = 1)
    assert(VersionedIndex.versions(spark, root).contains(2))
    // an unpublished partial dir neither consumes a keep slot (which
    // would push a superseded published version a racing serve may
    // still be reading out of the window) nor gets deleted (a
    // concurrent maintenance job may be mid-write)
    VersionedIndex.publish(spark, root, 3) // dir exists from above
    Seq(4).toDF("x").write.parquet(
      VersionedIndex.versionPath(root, 4) + "/marker")
    VersionedIndex.prune(spark, root, keep = 2)
    assert(VersionedIndex.versions(spark, root) == Seq(2, 3, 4),
      "published v2/v3 kept (the two newest PUBLISHED), partial v4 " +
        "untouched")
    assert(VersionedIndex.current(spark, root).contains(3))
  }

  test("Bm25Index: a serve resolved BEFORE compactVersioned returns " +
      "the superseded version bit-exactly (never torn); the flipped " +
      "pointer serves the compacted survivors exactly") {
    val root = tmp()
    val v1 = Bm25Index.writeVersioned(docs, root, nBuckets = 16)
    assert(v1 == 1 && VersionedIndex.current(spark, root).contains(1))
    // versioned serve == direct serve of the version dir
    val direct = Bm25Index.topK(spark,
        VersionedIndex.versionPath(root, 1), queries, k = 7)
      .collect().map(_.toSeq).toSet
    assert(Bm25Index.topKVersioned(spark, root, queries, k = 7)
      .collect().map(_.toSeq).toSet == direct)

    // a racing serve = one that resolved the pointer before the flip
    val resolvedPreCompact = VersionedIndex.currentPath(spark, root)
    val doomed = Bm25Index.topKVersioned(spark, root, queries, k = 3)
      .filter($"rk" === 1).select($"doc_id").distinct()
    Bm25Index.delete(doomed, resolvedPreCompact)
    val v2 = Bm25Index.compactVersioned(spark, root)
    assert(v2 == 2 && VersionedIndex.current(spark, root).contains(2))

    // the pre-compact snapshot STILL serves its original corpus,
    // bit-exactly (tombstones live in that version, so its own serve
    // reflects the deletion — the point is the files are not torn:
    // the ranking equals a fresh anti-joined serve of v1)
    val preSnapshot = Bm25Index.topK(spark, resolvedPreCompact,
        queries, k = 7).collect().map(_.toSeq).toSet
    assert(preSnapshot.nonEmpty)

    // the NEW version serves exactly a fresh index of the survivors
    val doomedIds = doomed.as[Long].collect().toSet
    val survivors = docs.filter(!$"doc_id".isin(doomedIds.toSeq: _*))
    val freshRoot = tmp()
    Bm25Index.writeVersioned(survivors, freshRoot, nBuckets = 16)
    assert(
      Bm25Index.topKVersioned(spark, root, queries, k = 7)
        .collect().map(_.toSeq).toSet ==
      Bm25Index.topKVersioned(spark, freshRoot, queries, k = 7)
        .collect().map(_.toSeq).toSet)
    // v2 equals the post-delete v1 serve too (compact only reclaims)
    assert(
      Bm25Index.topKVersioned(spark, root, queries, k = 7)
        .collect().map(_.toSeq).toSet == preSnapshot)
    // both versions coexist on disk until prune
    assert(VersionedIndex.versions(spark, root) == Seq(1, 2))
    VersionedIndex.prune(spark, root, keep = 1)
    assert(VersionedIndex.versions(spark, root) == Seq(2))
  }

  test("AnnIndex: compactVersioned leaves the superseded version's " +
      "files intact for racing serves and the new version drops " +
      "tombstoned vectors with the SAME models") {
    val root = tmp()
    val (v1, _) = AnnIndex.writeVersioned(emb, root,
      nlist = 8, coarseIters = 1, m = 8, codewords = 16, pqIters = 1)
    assert(v1 == 1)
    val before = AnnIndex.topKVersioned(spark, root, annQ, k = 5,
      nprobe = 3).collect().map(_.toSeq).toSet
    assert(before ==
      AnnIndex.topK(spark, VersionedIndex.versionPath(root, 1), annQ,
        k = 5, nprobe = 3).collect().map(_.toSeq).toSet)

    val resolvedPreCompact = VersionedIndex.currentPath(spark, root)
    val doomed = emb.filter($"vec_id" % 7 === 3).select($"vec_id")
    AnnIndex.delete(doomed, resolvedPreCompact)
    val v2 = AnnIndex.compactVersioned(spark, root)
    assert(v2 == 2 && VersionedIndex.current(spark, root).contains(2))

    // racing serve against the pre-compact snapshot: intact, and its
    // result equals what it returned when it WAS current
    val preServe = AnnIndex.topK(spark, resolvedPreCompact, annQ,
      k = 5, nprobe = 3).collect().map(_.toSeq).toSet
    assert(preServe.nonEmpty)
    // new version: no tombstoned id ever surfaces, models unchanged
    val after = AnnIndex.topKVersioned(spark, root, annQ, k = 5,
      nprobe = 3)
    val doomedIds = doomed.as[Long].collect().toSet
    assert(!after.select($"vec_id").as[Long].collect()
      .exists(doomedIds.contains))
    // same models: v2 serve == v1 post-delete serve (compact is purely
    // physical)
    assert(after.collect().map(_.toSeq).toSet == preServe)
    val (c1, b1) = AnnIndex.loadModels(spark,
      VersionedIndex.versionPath(root, 1))
    val (c2, b2) = AnnIndex.loadModels(spark,
      VersionedIndex.versionPath(root, 2))
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq ==
      b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("drift -> retrain -> swap composes: an in-distribution batch " +
      "appends into the current version; a drifted batch retrains, " +
      "re-encodes, and publishes a new version atomically") {
    val root = tmp()
    AnnIndex.writeVersioned(emb, root,
      nlist = 8, coarseIters = 1, m = 8, codewords = 16, pqIters = 1)
    // in-distribution: same vectors under fresh ids → append path
    val slim = emb.select($"vec_id", $"embedding")
    val sameDist = slim.select(($"vec_id" + 100000).as("vec_id"),
      $"embedding")
    val (r1, v1) = AnnIndex.retrainIfDrifted(spark,
      slim.unionByName(sameDist), sameDist, root, maxRatio = 2.0,
      nlist = 8, coarseIters = 1, m = 8, codewords = 16, pqIters = 1)
    assert(!r1 && v1 == 1)
    assert(VersionedIndex.current(spark, root).contains(1))
    // the appended batch is servable from the current version
    val apQ = sameDist.limit(3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    assert(AnnIndex.topKVersioned(spark, root, apQ, k = 3, nprobe = 8)
      .count() > 0)

    // drifted: a far-shifted batch must trip the probe and retrain on
    // the full corpus (old ∪ shifted), landing as a published v2
    val shifted = slim.select(($"vec_id" + 200000).as("vec_id"),
      transform($"embedding", x => x + lit(25.0f)).as("embedding"))
    val full = slim.unionByName(sameDist).unionByName(shifted)
    val (r2, v2) = AnnIndex.retrainIfDrifted(spark, full, shifted, root,
      maxRatio = 2.0,
      nlist = 8, coarseIters = 1, m = 8, codewords = 16, pqIters = 1)
    assert(r2 && v2 == 2)
    assert(VersionedIndex.current(spark, root).contains(2))
    // the swapped version IS a fresh deterministic write of the full
    // corpus: serve equality against an independent build
    val scratch = tmp()
    AnnIndex.writeVersioned(full, scratch,
      nlist = 8, coarseIters = 1, m = 8, codewords = 16, pqIters = 1)
    val sq = shifted.limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    assert(
      AnnIndex.topKVersioned(spark, root, sq, k = 5, nprobe = 3)
        .collect().map(_.toSeq).toSet ==
      AnnIndex.topKVersioned(spark, scratch, sq, k = 5, nprobe = 3)
        .collect().map(_.toSeq).toSet)
  }

  test("Retrieval: versioned build/serve parity, and compactVersioned " +
      "purges deleted docs into a new version while the superseded " +
      "snapshot keeps serving") {
    val root = tmp()
    val sub = docs.filter($"doc_id" < 60)
    val v1 = Retrieval.buildIndexVersioned(sub, root,
      targetChars = 200, dim = 64, nlist = 8, m = 8)
    assert(v1 == 1)
    val qs = Seq((0L, "vector window merge"), (1L, "stream processing"))
      .toDF("query_id", "text")
    val direct = Retrieval.search(spark,
        VersionedIndex.versionPath(root, 1), qs, k = 4)
      .collect().map(_.toSeq).toSet
    assert(Retrieval.searchVersioned(spark, root, qs, k = 4)
      .collect().map(_.toSeq).toSet == direct)

    val resolvedPreCompact = VersionedIndex.currentPath(spark, root)
    val doomedDoc = Retrieval.searchVersioned(spark, root, qs, k = 1)
      .select($"doc_id").limit(1).as[Long].collect().head
    Retrieval.deleteDocs(spark, resolvedPreCompact,
      Seq(doomedDoc).toDF("doc_id"))
    val v2 = Retrieval.compactVersioned(spark, root)
    assert(v2 == 2 && VersionedIndex.current(spark, root).contains(2))
    // racing serve: pre-compact snapshot intact and queryable
    assert(Retrieval.search(spark, resolvedPreCompact, qs, k = 4)
      .count() > 0)
    // new version never surfaces the deleted doc, on either tier
    assert(Retrieval.searchVersioned(spark, root, qs, k = 4)
      .filter($"doc_id" === doomedDoc).count() == 0)
    assert(Retrieval.hybridSearch(spark,
        VersionedIndex.currentPath(spark, root), qs, k = 4)
      .filter($"doc_id" === doomedDoc).count() == 0)
  }
}
