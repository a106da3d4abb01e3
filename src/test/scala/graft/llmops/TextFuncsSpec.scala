package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class TextFuncsSpec extends SparkTestBase {
  import spark.implicits._

  test("token counting") {
    val df = Seq("one two  three", "", "   ", "single").toDF("t")
    val got = df.select(TextFuncs.tokenCount($"t").as("n")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("approx BPE token count: ceil(len/4) per word") {
    val df = Seq("abcd efghijkl x").toDF("t") // 1 + 2 + 1
    assert(df.select(TextFuncs.approxBpeTokenCount($"t")).as[Long].head() == 4L)
  }

  test("langId picks the stopword-dominant language; und when none") {
    val df = Seq(
      "the cat and the dog in a house",          // en
      "el perro y la casa de los gatos",         // es
      "der hund und die katze ist von den",      // de
      "xyzzy qwerty plugh")                      // und
      .toDF("t")
    val got = df.select(TextFuncs.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("quality score stays in [0,1] over the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val mm = docs.select(TextFuncs.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("word n-grams and jaccard") {
    val df = Seq(("a b c d", "a b c e")).toDF("x", "y")
    val j = df.select(TextFuncs.ngramJaccard($"x", $"y", 2).as("j")).as[Double].head()
    // grams x: {a b, b c, c d}, y: {a b, b c, c e} → 2/4
    assert(math.abs(j - 0.5) < 1e-9)
  }

  test("charShingles distinct and sized") {
    val df = Seq("aaaaa").toDF("t")
    val got = df.select(TextFuncs.charShingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(got == Seq("aaa"))
  }
}
