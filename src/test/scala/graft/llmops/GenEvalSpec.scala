package graft.llmops

import graft.SparkTestBase

class GenEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("bleu: identity scores 1; a missing 4-gram zeroes BLEU " +
      "(unsmoothed strict); clipping caps repeats; brevity penalty " +
      "applies exactly; empty candidate keeps its row at 0") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      // 3-token candidate: p1=p2=p3=1 but no 4-gram -> bleu 0
      (2L, "the cat sat", "the cat sat on the mat"),
      // repeated token clipped against the reference count
      (3L, "the the the the", "the cat"),
      // perfect 5-token prefix of a 6-token ref: core 1, bp=exp(-0.2)
      (4L, "the cat sat on the", "the cat sat on the mat"),
      (5L, "", "some reference"))
      .toDF("doc_id", "candidate", "reference")
    val got = GenEval.bleu(pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Double]("p4") == 1.0 && r1.getAs[Double]("bp") == 1.0)
    assert(r1.getAs[Double]("bleu") == 1.0)
    val r2 = got(2L)
    assert(r2.getAs[Double]("p1") == 1.0 && r2.getAs[Double]("p3") == 1.0)
    assert(r2.getAs[Double]("p4") == 0.0 &&
      r2.getAs[Double]("bleu") == 0.0)
    assert(r2.getAs[Double]("bp") == 0.3679) // exp(1 - 6/3)
    assert(got(3L).getAs[Double]("p1") == 0.25)
    val r4 = got(4L)
    assert(r4.getAs[Double]("p4") == 1.0)
    assert(r4.getAs[Double]("bp") == 0.8187) // exp(1 - 6/5)
    assert(r4.getAs[Double]("bleu") == 0.8187)
    val r5 = got(5L)
    assert(r5.getAs[Long]("n_cand") == 0 &&
      r5.getAs[Double]("bleu") == 0.0 && r5.getAs[Double]("bp") == 0.0)
  }

  test("chrF: identity 1; whitespace-robust (thecat == the cat); " +
      "macro-averaged closed form; empty candidate scores 0") {
    val pairs = Seq(
      (1L, "identical text", "identical text"),
      (2L, "thecat", "the cat"),   // stripped: identical
      (3L, "ab", "abc"),
      (4L, "", "reference text"))
      .toDF("doc_id", "candidate", "reference")
    val got = GenEval.chrF(pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("chrf2") == 1.0)
    assert(got(2L).getAs[Double]("chrf2") == 1.0)
    val r3 = got(3L)
    // P: n1 1, n2 1, rest 0 -> 0.3333; R: (2/3 + 1/2 + 0...)/6 -> 0.1944
    assert(r3.getAs[Double]("chr_p") == 0.3333)
    assert(r3.getAs[Double]("chr_r") == 0.1944)
    assert(r3.getAs[Double]("chrf2") == 0.2121)
    val r4 = got(4L)
    assert(r4.getAs[Double]("chr_p") == 0.0 &&
      r4.getAs[Double]("chrf2") == 0.0)
  }

  test("chrF: maxChars caps the comparison window; reject bad cap") {
    val pairs = Seq((1L, "abcdef", "abcdef")).toDF(
      "doc_id", "candidate", "reference")
    // both sides capped to "abc": identical, but only n=1..3 exist,
    // so the macro-average over n=1..6 is 3/6 = 0.5 on each axis
    assert(GenEval.chrF(pairs, maxChars = 3).head()
      .getAs[Double]("chrf2") == 0.5)
    intercept[IllegalArgumentException] {
      GenEval.chrF(pairs, maxChars = 0)
    }
  }
}
