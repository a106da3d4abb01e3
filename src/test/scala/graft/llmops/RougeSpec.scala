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
}
