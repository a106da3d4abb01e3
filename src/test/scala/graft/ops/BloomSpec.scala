package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  lazy val lineitem = Tables.table(spark, sf0001, "lineitem")
  lazy val orders = Tables.table(spark, sf0001, "orders")

  test("prunedSemiJoin equals the plain semi-join exactly") {
    val dim = orders.filter($"o_custkey" < 50)
    val pruned = Bloom.prunedSemiJoin(
      lineitem, $"l_orderkey", dim, $"o_orderkey",
      expectedItems = 1000L, fpp = 0.01)
    val plain = lineitem.join(
      dim.select($"o_orderkey".as("k")).distinct(),
      $"l_orderkey" === $"k", "left_semi")
    assert(pruned.count() == plain.count())
    assert(pruned.select($"l_orderkey", $"l_linenumber")
      .exceptAll(plain.select($"l_orderkey", $"l_linenumber")).count() == 0)
  }

  test("bloom pre-filter admits every true match (no false negatives)") {
    val dim = orders.filter($"o_custkey" < 50)
    val bytes = Bloom.bloomBytesOf(dim, $"o_orderkey", 1000L, 0.01)
    val trueKeys = lineitem.join(
      dim.select($"o_orderkey".as("k")).distinct(),
      $"l_orderkey" === $"k", "left_semi")
    val missed = trueKeys.filter(!Bloom.mightContain(bytes, $"l_orderkey"))
    assert(missed.count() == 0)
  }

  test("mixed int/long key types still equal the plain coerced semi-join") {
    // xxhash64(5: int) != xxhash64(5L): without representation
    // alignment the bloom would reject every row and silently empty
    // the result while the coerced join would have matched
    val dim = orders.filter($"o_custkey" < 50)
      .select($"o_orderkey".cast("int").as("o_orderkey"))
    val pruned = Bloom.prunedSemiJoin(
      lineitem, $"l_orderkey", dim, $"o_orderkey",
      expectedItems = 1000L, fpp = 0.01)
    val plain = lineitem.join(
      dim.select($"o_orderkey".as("k")).distinct(),
      $"l_orderkey" === $"k", "left_semi")
    assert(pruned.count() == plain.count() && plain.count() > 0)
  }

  test("empty dim side yields an empty result, not an error") {
    val dim = orders.filter($"o_orderkey" < 0) // empty key set
    val pruned = Bloom.prunedSemiJoin(
      lineitem, $"l_orderkey", dim, $"o_orderkey",
      expectedItems = 10L, fpp = 0.01)
    assert(pruned.count() == 0)
  }

  test("bloom pre-filter actually prunes at a selective fpp") {
    val dim = orders.filter($"o_custkey" < 10) // very selective key set
    val bytes = Bloom.bloomBytesOf(dim, $"o_orderkey", 100L, 0.01)
    val total = lineitem.count()
    val passed = lineitem.filter(Bloom.mightContain(bytes, $"l_orderkey")).count()
    val trueMatches = lineitem.join(
      dim.select($"o_orderkey".as("k")).distinct(),
      $"l_orderkey" === $"k", "left_semi").count()
    assert(passed >= trueMatches)              // superset of true matches
    assert(passed <= trueMatches + (total * 0.05).toLong) // but prunes hard
  }
}
