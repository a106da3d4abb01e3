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

  test("containment pairs find the corpus near-dups") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = Winnowing.containmentPairs(docs, minShared = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // the known planted near-dup (8, 245) shares nearly all content
    assert(pairs.contains((8L, 245L)), s"missing known near-dup; got ${pairs.size} pairs")
  }

  test("expression works in DataFrames under codegen") {
    val df = Seq("the quick brown fox jumps over the lazy dog repeatedly").toDF("text")
    val fps = df.select(Winnowing.winnow_fingerprints($"text").as("f"))
      .as[Seq[Long]].head()
    assert(fps.nonEmpty)
  }
}
