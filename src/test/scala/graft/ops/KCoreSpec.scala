package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** k-core peel pins: closed-form rounds on a triangle-plus-tail,
  * full-graph collapse (K4 minus an edge at k=3), a brute-force peel
  * differential on a deterministic graph, the loud non-convergence
  * guard, and repartition stability (integer rounds — exact).
  */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Int]))))
      .toMap

  test("closed form: triangle keeps, tail peels outside-in") {
    // triangle {1,2,3} + tail 3-4-5: k=2 peels 5 (round 1) then 4
    // (round 2); the triangle survives
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = collect(KCore.kCore(e, 2))
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((true, None)))
    assert(got(3L) == ((true, None)))
    assert(got(4L) == ((false, Some(2))))
    assert(got(5L) == ((false, Some(1))))
  }

  test("K4 holds a 3-core; K4 minus an edge collapses entirely") {
    val k4 = (for { i <- 1 to 4; j <- (i + 1) to 4 }
      yield (i.toLong, j.toLong)).toDF("src", "dst")
    assert(collect(KCore.kCore(k4, 3)).values.forall(_._1))
    val broken = k4.filter(!($"src" === 1 && $"dst" === 2))
    val got = collect(KCore.kCore(broken, 3))
    assert(got.values.forall(!_._1))
    // 1 and 2 (degree 2) fall first; 3 and 4 (then degree 1) second
    assert(got(1L)._2 == Some(1) && got(2L)._2 == Some(1))
    assert(got(3L)._2 == Some(2) && got(4L)._2 == Some(2))
  }

  test("matches a brute-force synchronous peel; repartition-stable") {
    val n = 80
    val es = (0 until 300).map(i =>
      ((i * 31 % n).toLong, (i * 17 % n + i % 5).toLong))
    val edges = es.toDF("src", "dst")
    for (k <- Seq(2, 3, 4)) {
      val got = collect(KCore.kCore(edges, k))

      // in-memory synchronous peel
      val und = es.flatMap { case (a, b) =>
        if (a == b) Nil else Seq((a min b) -> (a max b)) }.distinct
      var adj = (und ++ und.map(_.swap)).groupBy(_._1)
        .map { case (kk, vs) => kk -> vs.map(_._2).toSet }
      val rounds = scala.collection.mutable.Map.empty[Long, Int]
      var r = 0
      var changed = true
      while (changed) {
        r += 1
        val doomed = adj.collect {
          case (v, nb) if nb.size < k => v }.toSet
        changed = doomed.nonEmpty
        if (changed) {
          doomed.foreach(v => rounds(v) = r)
          adj = adj.collect { case (v, nb) if !doomed(v) =>
            v -> (nb -- doomed) }
        }
      }
      adj.keys.foreach(v => assert(got(v) == ((true, None)), s"k=$k v=$v"))
      rounds.foreach { case (v, rr) =>
        assert(got(v) == ((false, Some(rr))), s"k=$k v=$v") }
    }
    val a = collect(KCore.kCore(edges, 3))
    val b = collect(KCore.kCore(edges.repartition(7), 3))
    assert(a == b)
  }

  test("non-convergence guard throws instead of half-peeling") {
    // a 7-node path peels one end pair per round at k=2: needs 3
    // rounds; maxRounds = 2 must throw, not return a partial peel
    val path = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      KCore.kCore(path, 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and with room it fully peels (a path has no 2-core)
    assert(collect(KCore.kCore(path, 2)).values.forall(!_._1))
  }
}
