package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    // big source: 8 docs × 10 tokens
    (1 to 8).map(i => ("web", s"w$i " * 10)): _*
  ) ++ Seq(
    // small source: 2 docs × 5 tokens
    ("books", "b1 b2 b3 b4 b5"),
    ("books", "c1 c2 c3 c4 c5"))

  private def df = corpus.toDF("source", "text")

  test("alpha=1 reproduces proportional weights; weights sum to ~1") {
    val w = Mixture.temperatureWeights(df, alpha = 1.0, tokenBudget = 90L)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(math.abs(w("web") - 80.0 / 90.0) < 1e-4)
    assert(math.abs(w("books") - 10.0 / 90.0) < 1e-4)
  }

  test("alpha<1 flattens: small source gains weight vs proportional") {
    val w = Mixture.temperatureWeights(df, alpha = 0.5, tokenBudget = 90L)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(w("books") > 10.0 / 90.0)
    assert(w("web") < 80.0 / 90.0)
    assert(math.abs(w.values.sum - 1.0) < 1e-4)
  }

  test("budget → rate caps at 1, epochs can exceed 1") {
    // budget far above corpus: every source over-sampled
    val rows = Mixture.temperatureWeights(df, alpha = 0.5,
        tokenBudget = 900L)
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getDouble(5)))
    rows.foreach { case (_, rate, epochs) =>
      assert(rate == 1.0)
      assert(epochs > 1.0)
    }
  }

  test("applyRates: deterministic keep, honors zero and full rates") {
    val rates = Seq(("web", 1.0), ("books", 0.0)).toDF("source", "rate")
    val kept = Mixture.applyRates(df, rates)
    val all = kept.collect()
    assert(all.filter(_.getString(0) == "books").forall(!_.getBoolean(2)))
    assert(all.filter(_.getString(0) == "web").forall(_.getBoolean(2)))
    // same result after repartition: pure function of content
    val kept2 = Mixture.applyRates(df.repartition(5), rates)
      .orderBy($"source", $"text").collect().map(_.getBoolean(2)).toSeq
    val kept1 = kept.orderBy($"source", $"text")
      .collect().map(_.getBoolean(2)).toSeq
    assert(kept1 == kept2)
  }

  test("unknown source (absent from rate table) is dropped, not kept") {
    val rates = Seq(("web", 1.0)).toDF("source", "rate")
    val kept = Mixture.applyRates(df, rates)
    assert(kept.filter($"source" === "books" && $"keep").count() == 0)
  }
}
