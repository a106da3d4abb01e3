package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BinningSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("quantile bins partition the corpus into ordered, balanced buckets") {
    val binned = Binning.quantileBins(docs, $"n_chars", Seq(0.25, 0.5, 0.75))
    assert(binned.count() == docs.count()) // every row in exactly one bin
    val stats = binned.groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .orderBy($"bin")
      .as[(Int, Long, Long, Long)].collect()
    assert(stats.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // bins are ordered: max of bin k ≤ min of bin k+1
    stats.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
    // quartiles: each bin within sampling slack of a quarter
    val n = docs.count().toDouble
    stats.foreach { s => assert(math.abs(s._2 / n - 0.25) < 0.1, s.toString) }
  }

  test("probs validation rejects unsorted or out-of-range fractions") {
    intercept[IllegalArgumentException] {
      Binning.quantileBins(docs, $"n_chars", Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      Binning.quantileBins(docs, $"n_chars", Seq(0.0, 0.5))
    }
  }
}
