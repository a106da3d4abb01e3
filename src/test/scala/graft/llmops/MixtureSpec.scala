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

  test("budgetAllocate: greedy fills best sources first under the " +
    "share cap and spends exactly the budget when supply allows") {
    // three sources with distinct quality ranks: prose-ish (high),
    // word salad (mid), short junk (low)
    val prose = (1 to 4).map(i => ("hi",
      "the quick brown fox jumps over the lazy dog and runs to the " +
        "house of a friend in town. " * 2))
    val mid = (1 to 4).map(i => ("md", s"alpha beta gamma delta " * 12))
    val low = (1 to 4).map(i => ("lo", "x" * 10))
    val docs = (prose ++ mid ++ low).toDF("source", "text")

    val stats = docs.groupBy($"source")
      .agg(sum(TextFuncs.tokenCount($"text")).as("nt"),
        avg(TextFuncs.qualityScore($"text")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(stats("hi")._2 > stats("md")._2 &&
      stats("md")._2 > stats("lo")._2) // the intended quality order

    val budget = stats("hi")._1 + 10 // hi fully + 10 tokens of md
    val out = Mixture.budgetAllocate(docs, budget, maxShare = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    assert(out("hi")._1 == stats("hi")._1 && out("hi")._2 == 1.0)
    assert(out("md")._1 == 10L)
    assert(out("lo")._1 == 0L && out("lo")._2 == 0.0)
    assert(out.values.map(_._1).sum == budget) // budget exactly spent

    // share cap binds: nobody exceeds floor(maxShare * budget)
    val capped = Mixture.budgetAllocate(docs, budget, maxShare = 0.3)
      .collect().map(r => r.getLong(4))
    assert(capped.forall(_ <= math.floor(0.3 * budget).toLong))

    // zero budget → zero allocations; repartition-stable
    assert(Mixture.budgetAllocate(docs, 0L)
      .agg(sum($"alloc_tokens")).head().getLong(0) == 0L)
    val a = Mixture.budgetAllocate(docs, budget, 0.5)
      .orderBy($"source").collect().toSeq
    val b = Mixture.budgetAllocate(docs.repartition(7), budget, 0.5)
      .orderBy($"source").collect().toSeq
    assert(a == b)
  }
}
