package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** HITS mutual reinforcement. Pins: closed-form scores on a hand
  * graph, the zero contracts (no out-links → hub 0, no in-links →
  * authority 0), determinism under repartitioning (the reason for
  * max-normalization), and a differential check against an in-memory
  * power iteration on a bigger deterministic graph.
  */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  test("closed-form scores on a two-authority star") {
    // 1→{10,11}, 2→{10,11}, 3→{10}
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("src", "dst")
    val got = Hits.hubsAuthorities(e, iterations = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // round 1: a=(indegree)/max → a(10)=1, a(11)=2/3;
    //   h(1)=h(2)=5/3, h(3)=1 → normalized 1, 1, 3/5
    // round 2: a(10)=1+1+0.6=2.6→1, a(11)=2/2.6;
    //   h(1)=h(2)=1+2/2.6, h(3)=1 → normalized 1, 1, 1/(1+2/2.6)
    assert(math.abs(got(10L)._2 - 1.0) < 1e-12)
    assert(math.abs(got(11L)._2 - 2.0 / 2.6) < 1e-12)
    assert(math.abs(got(1L)._1 - 1.0) < 1e-12)
    assert(math.abs(got(2L)._1 - 1.0) < 1e-12)
    assert(math.abs(got(3L)._1 - 1.0 / (1.0 + 2.0 / 2.6)) < 1e-12)
    // pure authorities have hub 0; pure hubs have authority 0
    assert(got(10L)._1 == 0.0 && got(11L)._1 == 0.0)
    assert(got(1L)._2 == 0.0 && got(2L)._2 == 0.0 && got(3L)._2 == 0.0)
  }

  test("matches an in-memory power iteration on a deterministic graph " +
    "and is repartition-stable") {
    val docs = Tables.documents(spark, sf0001)
    val edges = docs.select($"doc_id".as("src"),
      explode(array((0 until 3).map(k =>
        pmod($"doc_id" * 7919 + lit(k), lit(500))): _*)).as("dst"))
    val got = Hits.hubsAuthorities(edges, iterations = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap

    // reference: same rounds, same max normalization, plain Scala
    val es = edges.distinct().as[(Long, Long)].collect()
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val aRaw = es.groupBy(_._2).map { case (v, in) =>
        v -> in.map(e => hub(e._1)).sum }
      val aMax = aRaw.values.max
      auth = nodes.map(n => n -> (aRaw.getOrElse(n, 0.0) / aMax)).toMap
      val hRaw = es.groupBy(_._1).map { case (u, out) =>
        u -> out.map(e => auth(e._2)).sum }
      val hMax = hRaw.values.max
      hub = nodes.map(n => n -> (hRaw.getOrElse(n, 0.0) / hMax)).toMap
    }
    nodes.foreach { n =>
      assert(math.abs(got(n)._1 - hub(n)) < 1e-9, s"hub($n)")
      assert(math.abs(got(n)._2 - auth(n)) < 1e-9, s"auth($n)")
    }

    // repartitioning may reorder the per-node double sums (last-ulp
    // drift); the CONTRACT is stability at reporting precision
    val again = Hits.hubsAuthorities(edges.repartition(7), iterations = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    nodes.foreach { n =>
      assert(math.abs(again(n)._1 - got(n)._1) < 1e-9)
      assert(math.abs(again(n)._2 - got(n)._2) < 1e-9)
    }
  }
}
