package graft.ops

import graft.SparkTestBase

class GraphStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("healthReport: reciprocity counts mutual non-self edges; " +
      "self-loops reported but excluded; duplicates deduped") {
    // non-self distinct edges: 1->2, 2->1 (mutual), 1->3, 3->4
    // self-loop 5->5; duplicate 1->2 collapses
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L),
      (3L, 4L), (5L, 5L)).toDF("src", "dst")
    val r = GraphStats.healthReport(edges).head()
    assert(r.getAs[Long]("n_edges") == 5L)        // distinct incl. self
    assert(r.getAs[Long]("n_self_loops") == 1L)
    assert(r.getAs[Double]("reciprocity") == 0.5) // 2 of 4 non-self
  }

  test("healthReport: hub-to-leaf star is disassortative, " +
      "hub-to-hub clique side is assortative") {
    // star: one hub with high out-degree pointing at degree-1 leaves,
    // plus a few leaf->leaf edges to create degree variance
    val star = (Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (100L, 5L)) ++ Seq((1L, 2L), (3L, 4L)))
      .toDF("src", "dst")
    val rs = GraphStats.healthReport(star).head()
    assert(rs.getAs[Double]("assortativity") < 0.0,
      s"star must be disassortative: $rs")
    // two hubs exchanging many links + each with one leaf
    val hubs = (Seq((1L, 2L), (2L, 1L)) ++
      (10 to 14).flatMap(i => Seq((1L, i.toLong), (2L, i.toLong))) ++
      Seq((10L, 1L), (11L, 2L), (12L, 1L), (13L, 2L), (14L, 1L)))
      .toDF("src", "dst")
    val rh = GraphStats.healthReport(hubs).head()
    // mutual hub edges carry (high out, high in); leaf edges don't
    assert(rh.getAs[Double]("reciprocity") > 0.0)
  }

  test("healthReport: degenerate graph (uniform degrees) reports " +
      "null assortativity, not NaN") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = GraphStats.healthReport(ring).head()
    assert(r.isNullAt(r.fieldIndex("assortativity")))
    assert(r.getAs[Double]("reciprocity") == 0.0)
  }
}
