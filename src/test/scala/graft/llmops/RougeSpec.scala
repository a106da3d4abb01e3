package graft.llmops

import graft.SparkTestBase

class RougeSpec extends SparkTestBase {
  import spark.implicits._

  test("rougeN: closed-form bigram overlap; clipping caps repeated " +
      "grams at the reference count") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat lay on the mat"),
      // candidate repeats 'a a' three times; reference has it once —
      // clipped overlap is 1, not 3
      (2L, "a a a a", "a a"),
      (3L, "same text here twice", "same text here twice"))
      .toDF("doc_id", "candidate", "reference")
    val got = Rouge.rougeN(pairs, n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_cand") == 5 && r1.getAs[Long]("n_ref") == 5)
    assert(r1.getAs[Long]("overlap") == 3) // the cat / on the / the mat
    assert(r1.getAs[Double]("precision") == 0.6 &&
      r1.getAs[Double]("recall") == 0.6 && r1.getAs[Double]("f1") == 0.6)
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_cand") == 3 && r2.getAs[Long]("n_ref") == 1)
    assert(r2.getAs[Long]("overlap") == 1)
    assert(r2.getAs[Double]("precision") == 0.3333 &&
      r2.getAs[Double]("recall") == 1.0)
    assert(r2.getAs[Double]("f1") == 0.5)
    val r3 = got(3L)
    assert(r3.getAs[Double]("precision") == 1.0 &&
      r3.getAs[Double]("recall") == 1.0 && r3.getAs[Double]("f1") == 1.0)
  }

  test("rougeN: empty or too-short sides score 0.0 (not null) and " +
      "every input pair keeps its row") {
    val pairs = Seq(
      (1L, "", "some reference text here"),
      (2L, "one", "some reference text here"), // < n tokens: 0 grams
      (3L, "some candidate text", ""))
      .toDF("doc_id", "candidate", "reference")
    val got = Rouge.rougeN(pairs, n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id).getAs[Double]("precision") == 0.0)
      assert(got(id).getAs[Double]("recall") == 0.0)
      assert(got(id).getAs[Double]("f1") == 0.0)
    }
    assert(got(1L).getAs[Long]("n_cand") == 0)
    assert(got(2L).getAs[Long]("n_cand") == 0)
    assert(got(3L).getAs[Long]("n_ref") == 0)
  }

  test("rougeL: order-aware LCS closed forms — a shuffled candidate " +
      "keeps its unigram bag but loses its LCS; repeats don't " +
      "over-credit; empty and null sides score 0.0") {
    val pairs = Seq(
      // subsequence with a gap: LCS(the cat sat mat / the cat on mat)
      (1L, "the cat sat mat", "the cat on mat"),         // lcs 3
      (2L, "identical token stream", "identical token stream"),
      // full reversal: every token shared, LCS only 1
      (3L, "d c b a", "a b c d"),
      // candidate repeats one reference token
      (4L, "a a a a", "x a y"),                           // lcs 1
      (5L, "", "some reference text"),
      (6L, null.asInstanceOf[String], "ref here"))
      .toDF("doc_id", "candidate", "reference")
    val got = Rouge.rougeL(pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("lcs") == 3 && r1.getAs[Long]("n_cand") == 4)
    assert(r1.getAs[Double]("precision") == 0.75 &&
      r1.getAs[Double]("recall") == 0.75 &&
      r1.getAs[Double]("f1") == 0.75)
    assert(got(2L).getAs[Double]("f1") == 1.0)
    val r3 = got(3L)
    assert(r3.getAs[Long]("lcs") == 1)
    assert(r3.getAs[Double]("precision") == 0.25)
    val r4 = got(4L)
    assert(r4.getAs[Long]("lcs") == 1 &&
      r4.getAs[Double]("recall") == 0.3333)
    val r5 = got(5L)
    assert(r5.getAs[Long]("n_cand") == 0 && r5.getAs[Long]("lcs") == 0)
    assert(r5.getAs[Double]("precision") == 0.0 &&
      r5.getAs[Double]("f1") == 0.0)
    // null text counts as empty, the row survives
    assert(got(6L).getAs[Long]("n_cand") == 0 &&
      got(6L).getAs[Double]("f1") == 0.0)
  }

  test("rougeL: maxTokens caps both sides of the DP — coverage " +
      "beyond the cap is invisible by contract") {
    val pairs = Seq(
      (1L, "a b c d e f", "a b c d e f"))
      .toDF("doc_id", "candidate", "reference")
    val capped = Rouge.rougeL(pairs, maxTokens = 3).head()
    assert(capped.getAs[Long]("n_cand") == 3 &&
      capped.getAs[Long]("lcs") == 3)
    assert(capped.getAs[Double]("f1") == 1.0)
    intercept[IllegalArgumentException] {
      Rouge.rougeL(pairs, maxTokens = 0)
    }
  }

  test("lcsKernel: DP cross-check against a reference recursion on " +
      "small random token arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def lcsRef(a: Seq[String], b: Seq[String]): Int =
      if (a.isEmpty || b.isEmpty) 0
      else if (a.head == b.head) 1 + lcsRef(a.tail, b.tail)
      else math.max(lcsRef(a.tail, b), lcsRef(a, b.tail))
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d")
    for (_ <- 0 until 60) {
      val a = Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(4)))
      val b = Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(4)))
      def arr(s: Seq[String]) = new GenericArrayData(
        s.map(UTF8String.fromString).toArray[Any])
      assert(graft.expr.SeqSim.lcsKernel(arr(a), arr(b)) ==
        lcsRef(a, b), s"a=$a b=$b")
    }
  }
}
