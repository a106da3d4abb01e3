package graft.llmops

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def jaccard(a: String, b: String, k: Int = 5): Double = {
    def sh(t: String) = {
      val s = t.toLowerCase.replaceAll("\\s+", " ")
      (0 until math.max(s.length - k + 1, 1)).map(i => s.substring(i, math.min(i + k, s.length))).toSet
    }
    val (sa, sb) = (sh(a), sh(b))
    if ((sa ++ sb).isEmpty) 0.0 else (sa & sb).size.toDouble / (sa ++ sb).size
  }

  val docA = "the quick brown fox jumps over the lazy dog again and again in the morning"
  val docB = "the quick brown fox jumps over the lazy dog again and again in the evening"
  val docC = "completely different content about spark catalyst optimizer internals"

  test("minhash estimates jaccard within tolerance") {
    val est = SketchKernels.signatureSimilarity(
      SketchKernels.minhash(docA, 5, 256), SketchKernels.minhash(docB, 5, 256))
    val exact = jaccard(docA, docB)
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
    val estFar = SketchKernels.signatureSimilarity(
      SketchKernels.minhash(docA, 5, 256), SketchKernels.minhash(docC, 5, 256))
    assert(estFar < 0.2, s"unrelated docs estimated $estFar")
  }

  test("minhash is deterministic and identical docs have sim 1.0") {
    val s1 = SketchKernels.minhash(docA, 5, 128)
    val s2 = SketchKernels.minhash(docA, 5, 128)
    assert(s1.toSeq == s2.toSeq)
    assert(SketchKernels.signatureSimilarity(s1, s2) == 1.0)
  }

  test("simhash: near-identical docs are close in Hamming space") {
    val a = SketchKernels.simhash64(docA)
    val b = SketchKernels.simhash64(docB)
    val c = SketchKernels.simhash64(docC)
    assert(java.lang.Long.bitCount(a ^ b) <= 12)
    assert(java.lang.Long.bitCount(a ^ c) > 12)
  }

  test("expressions evaluate in DataFrames") {
    val df = Seq(docA, docB, docC).toDF("text")
    val sigs = df.select(Sketches.minhash_signature($"text", 5, 64).as("sig"),
      Sketches.simhash64($"text").as("fp"))
    val rows = sigs.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Long](0).size == 64))
  }

  test("signatureSim column matches kernel computation") {
    val df = Seq((docA, docB)).toDF("a", "b")
    val got = df.select(Sketches.signatureSim(
      Sketches.minhash_signature($"a", 5, 128),
      Sketches.minhash_signature($"b", 5, 128)).as("s")).as[Double].head()
    val want = SketchKernels.signatureSimilarity(
      SketchKernels.minhash(docA, 5, 128), SketchKernels.minhash(docB, 5, 128))
    assert(math.abs(got - want) < 1e-9)
  }

  test("hamming64 column") {
    val df = Seq((3L, 1L)).toDF("a", "b")
    assert(df.select(Sketches.hamming64($"a", $"b")).as[Long].head() == 1L)
  }
}
