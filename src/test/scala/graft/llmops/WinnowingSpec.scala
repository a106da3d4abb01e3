package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkTestBase {
  import spark.implicits._

  test("shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    val shared = "the quarterly earnings report was published on schedule today"
    val a = s"intro text before. $shared and some trailing content here"
    val b = s"completely different opening words. $shared unrelated ending"
    val fa = WinnowKernels.fingerprints(a, 8, 12).toSet
    val fb = WinnowKernels.fingerprints(b, 8, 12).toSet
    assert((fa & fb).nonEmpty, "winnowing guarantee violated")
    val c = "nothing in common with those documents at all whatsoever"
    assert((fa & WinnowKernels.fingerprints(c, 8, 12).toSet).isEmpty)
  }

  test("fingerprints are deterministic; short text yields single min") {
    val f1 = WinnowKernels.fingerprints("abcdefghij", 8, 12)
    val f2 = WinnowKernels.fingerprints("abcdefghij", 8, 12)
    assert(f1.toSeq == f2.toSeq && f1.length == 1)
    assert(WinnowKernels.fingerprints("abc", 8, 12).isEmpty)
    assert(WinnowKernels.fingerprints(null, 8, 12).isEmpty)
  }

  test("containment pairs find docs sharing a distinctive passage") {
    // constructed corpus: doc i has unique filler; docs 3 and 7 embed
    // the same long distinctive sentence (the winnowing use case —
    // quote/boilerplate detection, not global near-dup)
    val quote = "shareholders of record will receive the quarterly dividend " +
      "payable on the fifteenth business day following declaration"
    val docs = (0L until 20L).map { i =>
      // per-doc filler from a disjoint alphabet: letter runs can't
      // share shingles across docs
      val c = ('a' + i).toChar.toString
      val filler = Seq.fill(10)(c * 6).mkString(" ")
      val text = if (i == 3 || i == 7) s"$filler $quote $filler" else s"$filler $filler"
      (i, text)
    }.toDF("doc_id", "text")
    // maxDocFreq=3: the cross-doc filler shingle collisions (df≈20)
    // are boilerplate and must be dropped; the quote (df=2) survives
    val pairs = Winnowing.containmentPairs(docs, minShared = 3, maxDocFreq = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 7L)), s"got $pairs")
  }

  test("df guard drops boilerplate fingerprints (no pair explosion)") {
    // every doc shares the same boilerplate; no pair shares anything rare
    val docs = (0L until 30L).map { i =>
      (i, s"standard legal disclaimer applies to all documents herein unique-token-$i")
    }.toDF("doc_id", "text")
    val pairs = Winnowing.containmentPairs(docs, minShared = 3, maxDocFreq = 10)
    assert(pairs.count() == 0)
  }

  test("expression works in DataFrames under codegen") {
    val df = Seq("the quick brown fox jumps over the lazy dog repeatedly").toDF("text")
    val fps = df.select(Winnowing.winnow_fingerprints($"text").as("f"))
      .as[Seq[Long]].head()
    assert(fps.nonEmpty)
  }
}
