package graft.ops

import graft.SparkTestBase

class CommunitiesSpec extends SparkTestBase {
  import spark.implicits._

  test("two cliques joined by one bridge edge split into two communities") {
    // cliques {0,1,2,3} and {10,11,12,13}, bridge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
      .toDF("src", "dst")
    val labels = Communities.labelPropagation(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L).map(labels) == Set(labels(0L)),
      "clique A must agree on one label")
    assert(Set(11L, 12L, 13L).map(labels) == Set(labels(11L)),
      "clique B must agree on one label")
    assert(labels(0L) != labels(11L),
      s"bridged cliques must keep distinct labels: $labels")
  }

  test("triangle unifies; self-loops dropped; determinism across runs") {
    // a triangle converges (unlike a path, where synchronous LPA
    // two-cycles by construction — the documented iteration-cap
    // rationale); node 7 has only a self-loop, which is dropped
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 7L))
      .toDF("src", "dst")
    val a = Communities.labelPropagation(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Communities.labelPropagation(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "synchronous LPA must be deterministic")
    assert(!a.contains(7L))
    assert(a.values.toSet == Set(1L), s"triangle should unify on min: $a")
  }

  test("ties break toward the smallest label") {
    // node 5 has one neighbor in each of two size-1 'communities':
    // equal votes, the smaller label must win
    val edges = Seq((1L, 5L), (9L, 5L)).toDF("src", "dst")
    val labels = Communities.labelPropagation(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(5L) == 1L, s"tie must go to min label: $labels")
  }
}
