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

  test("communityReport: two bridged cliques — high modularity for the " +
      "true split, near-zero for the all-in-one labeling") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
      .toDF("src", "dst")
    val split = (Seq(0L, 1L, 2L, 3L).map(_ -> 1L) ++
      Seq(10L, 11L, 12L, 13L).map(_ -> 2L)).toDF("node", "label")
    val rep = Communities.communityReport(edges, split)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5), r.getDouble(7)))
      .toMap
    // each clique: 6 intra edges, 1 cut, conductance 1/13
    assert(rep(1L)._1 == 6L && rep(1L)._2 == 1L)
    assert(math.abs(rep(1L)._3 - 0.0769) < 1e-9, s"$rep")
    val q = rep(1L)._4
    assert(q > 0.3 && q < 0.5, s"modularity=$q") // well-split graph
    // degenerate labeling: everything one community -> Q = 0
    val allOne = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L).map(_ -> 1L))
      .toDF("node", "label")
    val q0 = Communities.communityReport(edges, allOne)
      .head().getDouble(7)
    assert(math.abs(q0) < 1e-9, s"all-in-one Q=$q0")
  }

  test("communityReport composes with labelPropagation end to end") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
      .toDF("src", "dst")
    val labels = Communities.labelPropagation(edges, iterations = 4)
    val q = Communities.communityReport(edges, labels)
      .head().getDouble(7)
    assert(q > 0.3, s"LPA labeling should score well here: $q")
  }
}
