package graft.llmops

import graft.SparkTestBase

class StylometrySpec extends SparkTestBase {
  import spark.implicits._

  test("burrowsDelta: two-group closed form — |dz| is exactly 2 per " +
      "differing head word, 0 per shared one, so delta = 2d/k") {
    // group A: four words once each (rel freq .25 each)
    // group B: gamma doubled, delta absent -> 2 of 4 head words differ
    val docs = Seq(
      ("A", "alpha beta gamma delta"),
      ("B", "alpha beta gamma gamma"))
      .toDF("source", "text")
    val got = Stylometry.burrowsDelta(docs, k = 4).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    // (2 + 2 + 0 + 0) / 4
    assert(r.getDouble(2) == 1.0, r.toString)
  }

  test("burrowsDelta: identical styles score 0; a divergent third " +
      "group is farther from both; zero-variance words contribute 0") {
    val common = "the of and to in the of and"
    val docs = Seq(
      ("A", common), ("A", common),
      ("B", common), ("B", common),
      ("C", "zzz yyy xxx www zzz yyy xxx www"))
      .toDF("source", "text")
    val got = Stylometry.burrowsDelta(docs, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) == 0.0)
    assert(got(("A", "C")) > 0.5 && got(("B", "C")) > 0.5)
    assert(got(("A", "C")) == got(("B", "C")))
  }

  test("burrowsDelta: repartition-stable and null groups/texts " +
      "excluded") {
    val docs = Seq(
      ("A", "one two three four"), ("B", "one two five six"),
      ("C", "seven eight nine ten"),
      (null.asInstanceOf[String], "junk junk junk"),
      ("A", null.asInstanceOf[String]))
      .toDF("source", "text")
    val a = Stylometry.burrowsDelta(docs, k = 6)
      .collect().map(_.toSeq).toSet
    val b = Stylometry.burrowsDelta(docs.repartition(7), k = 6)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3)
  }
}
