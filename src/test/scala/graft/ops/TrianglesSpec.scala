package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting. Pins: closed forms (K4, star,
  * triangle-with-pendant), the null-coefficient contract for degree
  * < 2, input normalization (direction/duplicates/self-loops), a
  * brute-force differential on a deterministic pseudo-random graph,
  * and repartition stability (counts are integers — exact equality).
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  test("closed forms: K4, star, triangle with a pendant") {
    // K4 on {1,2,3,4}: every node degree 3, in 3 triangles, coeff 1
    val k4 = (for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong))
      .toDF("src", "dst")
    val gotK4 = Triangles.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    (1L to 4L).foreach { n =>
      assert(gotK4(n) == ((3L, 3L, 1.0)), s"K4 node $n")
    }

    // star 0-{1..5}: no triangles; hub coeff 0, leaves coeff null (deg 1)
    val star = (1 to 5).map(i => (0L, i.toLong)).toDF("src", "dst")
    val gotStar = Triangles.triangleCounts(star).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(gotStar(0L) == ((5L, 0L, Some(0.0))))
    (1L to 5L).foreach(n => assert(gotStar(n) == ((1L, 0L, None))))

    // triangle {1,2,3} plus pendant 3-4: node 3 has deg 3 but only the
    // one triangle among its 3 neighbor pairs → coeff 1/3
    val pend = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val gotP = Triangles.triangleCounts(pend).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(gotP(1L) == ((2L, 1L, Some(1.0))))
    assert(gotP(2L) == ((2L, 1L, Some(1.0))))
    assert(gotP(3L)._1 == 3L && gotP(3L)._2 == 1L)
    assert(math.abs(gotP(3L)._3.get.asInstanceOf[Double] - 1.0 / 3) < 1e-12)
    assert(gotP(4L) == ((1L, 0L, None)))

    val stats = Triangles.triangleStats(pend).collect()(0)
    assert(stats.getLong(0) == 1L) // one triangle, counted once
    assert(stats.getLong(2) == 4L)
  }

  test("direction, duplicate edges, and self-loops are normalized away") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // one undirected edge
      (2L, 3L), (3L, 1L),
      (2L, 2L) // self-loop: dropped
    ).toDF("src", "dst")
    val got = Triangles.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to 3L).foreach(n => assert(got(n) == ((2L, 1L)), s"node $n"))
  }

  test("matches brute force on a deterministic graph; repartition-stable") {
    val n = 60
    val es = (0 until 400).map { i =>
      ((i * 31 % n).toLong, (i * 17 % n + i % 7).toLong)
    }
    val edges = es.toDF("src", "dst")
    val got = Triangles.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // brute force: adjacency set, count closed neighbor pairs per node
    val undirected = es.flatMap { case (a, b) =>
      if (a == b) Nil else Seq((a min b) -> (a max b)) }.distinct
    val adj = (undirected ++ undirected.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    adj.foreach { case (node, nbrs) =>
      val ts = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      assert(got(node) == ((nbrs.size.toLong, ts.toLong)),
        s"node $node: got ${got(node)}, want (${nbrs.size}, $ts)")
    }

    val again = Triangles.triangleCounts(edges.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == got)
  }

  test("sf0.001 synthetic graph has triangles and exact per-node counts") {
    val docs = Tables.documents(spark, sf0001)
    val edges = docs.filter($"doc_id" < 300)
      .select($"doc_id".as("src"),
        explode(array(
          pmod($"doc_id" + 1, lit(100)),
          pmod($"doc_id" + 2, lit(100)),
          pmod($"doc_id" * 7919 + 5, lit(100)))).as("dst"))
    val per = Triangles.triangleCounts(edges)
    assert(per.agg(sum($"triangles")).collect()(0).getLong(0) > 0)
  }
}
