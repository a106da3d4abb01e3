package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class TrainExportSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)
    .select($"doc_id", $"text").cache()

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-trainexport")
    d.toFile.deleteOnExit()
    d.resolve("shards").toString
  }

  test("fragments tile every shard's sequences exactly and cover " +
      "every document completely, each doc in exactly one shard") {
    val frags = TrainExport.epochFragments(docs, seqLen = 64, nShards = 8)
      .cache()
    // every sequence except each shard's tail holds exactly seqLen
    val fill = frags.groupBy($"shard", $"seq_id")
      .agg(sum($"n_toks").as("t"))
    val lastSeq = fill.groupBy($"shard").agg(max($"seq_id").as("last"))
    assert(fill.join(lastSeq, "shard").filter($"seq_id" =!= $"last")
      .filter($"t" =!= 64).count() == 0, "a non-tail sequence is not full")
    // no fragment overruns its sequence
    assert(frags.filter($"seq_offset" + $"n_toks" > 64).count() == 0)
    // every nonzero-token doc covered exactly once, from offset 0
    val dl = docs.select($"doc_id",
        TextFuncs.tokenCount($"text").cast("long").as("dl"))
      .filter($"dl" >= 1)
    val cover = frags.groupBy($"doc_id")
      .agg(sum($"n_toks").as("got"), min($"doc_offset").as("mn"),
        countDistinct($"shard").as("n_shards"))
      .join(dl, "doc_id")
    assert(cover.count() == dl.count())
    assert(cover.filter($"got" =!= $"dl" || $"mn" =!= 0 ||
      $"n_shards" =!= 1).count() == 0)
    frags.unpersist()
  }

  test("deterministic: rerun and repartitioned input are identical; " +
      "a new epoch seed reorders but conserves the token mass") {
    val a = TrainExport.epochFragments(docs, 64, 8).collect()
      .map(_.toSeq).toSet
    val b = TrainExport.epochFragments(docs.repartition(13), 64, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val c = TrainExport.epochFragments(docs, 64, 8, seed = "epoch-1")
      .collect().map(_.toSeq).toSet
    assert(c != a, "a fresh epoch seed must reshuffle the layout")
    def mass(s: Set[Seq[Any]]) =
      s.toSeq.map(_(5).asInstanceOf[Long]).sum
    assert(mass(c) == mass(a), "token mass must be seed-invariant")
  }

  test("writeShards: the manifest describes the written fragments " +
      "exactly; each shard lands as one file; params persist") {
    val path = tmp()
    TrainExport.writeShards(docs, path, seqLen = 64, nShards = 8,
      seed = "epoch-0")
    val frags = spark.read.parquet(s"$path/fragments")
    val fromFrags = frags.groupBy($"shard")
      .agg((max($"seq_id") + 1).as("n_seqs"),
        countDistinct($"doc_id").as("n_docs"),
        sum($"n_toks").as("n_tokens"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val manifest = spark.read.parquet(s"$path/manifest")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(manifest == fromFrags)
    assert(manifest.size == 8, "every shard must appear")
    // one consolidated file per shard directory — not tasks×shards
    val dirs = new java.io.File(s"$path/fragments").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8)
    dirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${d.getName}: $n files")
    }
    val p = spark.read.parquet(s"$path/params").head()
    assert(p.getInt(0) == 64 && p.getInt(1) == 8 &&
      p.getString(2) == "epoch-0")
  }

  test("affectedSequences: exactly the sequences holding a doomed doc, " +
      "with exact doomed/total token masses") {
    val path = tmp()
    TrainExport.writeShards(docs, path, seqLen = 64, nShards = 8)
    val doomed = docs.select($"doc_id").filter($"doc_id" % 11 === 3)
    val got = TrainExport.affectedSequences(spark, path, doomed)
    // expected straight from the in-memory fragment table
    val frags = TrainExport.epochFragments(docs, seqLen = 64, nShards = 8)
    val expected = frags
      .join(doomed.withColumn("__dm", lit(1)), Seq("doc_id"), "left")
      .groupBy($"shard", $"seq_id")
      .agg(sum(coalesce($"__dm", lit(0))).as("doomed_docs"),
        sum(when($"__dm" === 1, $"n_toks").otherwise(0L))
          .as("doomed_toks"),
        sum($"n_toks").as("seq_toks"))
      .filter($"doomed_docs" > 0)
      .withColumn("doomed_frac",
        $"doomed_toks".cast("double") / $"seq_toks")
    assert(got.count() > 0)
    assert(got.collect().map(_.toSeq).toSet ==
      expected.collect().map(_.toSeq).toSet)
    // sanity: fractions in (0, 1], non-tail totals are exactly seqLen
    assert(got.filter($"doomed_frac" <= 0 || $"doomed_frac" > 1)
      .count() == 0)
    // an empty doom list affects nothing
    assert(TrainExport.affectedSequences(spark, path,
      docs.select($"doc_id").limit(0)).count() == 0)
  }

  test("string ids fail LOUDLY: a silent long-cast would null every " +
      "doc_id (corrupt export) or report ZERO affected sequences " +
      "(corrupt takedown audit)") {
    val strDocs = docs.withColumn("doc_id", $"doc_id".cast("string"))
    val e1 = intercept[IllegalArgumentException] {
      TrainExport.epochFragments(strDocs, seqLen = 64, nShards = 4)
    }
    assert(e1.getMessage.contains("integral"))
    val path = tmp()
    TrainExport.writeShards(docs, path, seqLen = 64, nShards = 4)
    val e2 = intercept[IllegalArgumentException] {
      TrainExport.affectedSequences(spark, path,
        docs.select($"doc_id".cast("string").as("doc_id")))
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("shardManifest: order-free receipts — reorder matches, any " +
      "row change, truncation, or double-ship flips its shard row") {
    import org.apache.spark.sql.functions._
    val export = (1L to 200L).map(i => (i % 8, i, s"text-$i"))
      .toDF("shard", "doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      TrainExport.shardManifest(df, "shard", Seq("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = m(export)
    assert(base.keySet == (0L to 7L).toSet)
    // arrival order is irrelevant: the receipt is order-free
    assert(m(export.orderBy($"doc_id".desc).repartition(7)) == base)
    // one corrupted row flips exactly its shard's fingerprints
    val corrupted = export.withColumn("text",
      when($"doc_id" === 42, lit("corrupted")).otherwise($"text"))
    val cm = m(corrupted)
    assert(cm(42 % 8) != base(42 % 8))
    assert((0L to 7L).filter(_ != 42 % 8).forall(s => cm(s) == base(s)))
    // truncation changes n_rows; double-ship changes n_rows AND sum32
    // (the even-multiplicity case XOR alone would cancel on)
    val doubled = export.unionByName(export.filter($"shard" === 3))
    val dm = m(doubled)
    assert(dm(3L)._1 == base(3L)._1 * 2)
    // a doubled multiset XORs to ZERO — the even-multiplicity
    // blindness that count and SUM exist to cover
    assert(dm(3L)._2 == 0L && base(3L)._2 != 0L)
    assert(dm(3L)._3 == base(3L)._3 * 2)
  }
}
