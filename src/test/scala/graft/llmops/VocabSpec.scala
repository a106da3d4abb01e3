package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: word counts → frequency-weighted char pairs. */
  private def naive(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def run(texts: Seq[String]): Map[String, Long] =
    Vocab.bpePairCounts(texts.toDF("text"), $"text")
      .as[(String, Long)].collect().toMap

  test("pair counts match a driver-side BPE merge round") {
    val texts = Seq("Spark spark batch", "batch line  spark", "  shuffle  ")
    assert(run(texts) == naive(texts))
  }

  test("single-char words and empty tokens contribute nothing") {
    assert(run(Seq("a b c", " x ")) == Map.empty[String, Long])
    assert(run(Seq("a bc a")) == Map("bc" -> 1L))
  }

  test("counts weight by corpus frequency, not document presence") {
    // "zz" appears 3 times in one doc and once in another -> cnt 4
    assert(run(Seq("zz zz zz", "zz"))("zz") == 4L)
  }

  test("agrees with a full driver replay on the real table") {
    val texts = Tables.documents(spark, sf0001)
      .select($"text").as[String].collect().toSeq
    assert(run(texts) == naive(texts))
  }
}
