package graft.ops

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 20)
      : Map[Long, Double] =
    PageRank.ranks(edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Double)].collect().toMap

  /** Driver-side reference power iteration. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map(p => r(p._1) / out(p._1)).sum).toMap
      r = nodes.map(n => n -> ((1 - d) + d * in.getOrElse(n, 0.0))).toMap
    }
    r
  }

  test("matches a driver-side power iteration") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L),
      (5L, 4L), (1L, 3L))
    val got = run(edges, iters = 8)
    val want = naive(edges, iters = 8)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, v) =>
      assert(math.abs(v - want(n)) < 1e-9, s"node $n: $v vs ${want(n)}")
    }
  }

  test("a sink pointed at by everyone outranks its pointers") {
    // star into node 0
    val edges = (1L to 20L).map(i => (i, 0L))
    val got = run(edges)
    assert(got(0L) > got(1L) * 5)
  }

  test("symmetric cycle converges to equal ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, iters = 30)
    val vs = got.values.toSeq
    assert(vs.max - vs.min < 1e-6)
    // no dangling nodes: total mass conserved at |V|
    assert(math.abs(vs.sum - 3.0) < 1e-6)
  }
}
