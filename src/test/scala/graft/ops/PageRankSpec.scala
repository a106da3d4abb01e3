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

  test("per-round plans never re-shuffle edge rows") {
    // The at-scale contract from the scaladoc: edges+degrees are
    // pinned pre-partitioned by src, so the only per-round exchange is
    // the contribution aggregation — no exchange ever carries edge
    // rows (dst/deg columns). Broadcast off emulates |V| above the
    // threshold; AQE off keeps captured plans final and deterministic.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        captured.add(qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edges = spark.range(2000)
        .selectExpr("id % 97 AS src", "(id * 31) % 89 AS dst")
      PageRank.ranks(edges, iterations = 3)
      // listener delivery is async; each round's checkpoint is one QE
      // with two joins (edges⋈ranks, nodes⋈contribs)
      def roundPlans() = {
        import scala.jdk.CollectionConverters._
        captured.asScala.map(_.executedPlan).filter(p => p.collect {
          case j: SortMergeJoinExec => j
          case j: ShuffledHashJoinExec => j
        }.size == 2).toSeq
      }
      val deadline = System.nanoTime() + 10_000_000_000L
      while (roundPlans().size < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      val rounds = roundPlans()
      assert(rounds.size >= 3, s"captured only ${rounds.size} round plans")
      for (p <- rounds) {
        val edgeShuffles = p.collect {
          case e: ShuffleExchangeLike
              if e.output.exists(a => a.name == "dst" || a.name == "deg") => e
        }
        assert(edgeShuffles.isEmpty,
          s"edge rows re-shuffled:\n${edgeShuffles.mkString("\n")}\nin plan:\n$p")
        // exactly the one unavoidable exchange: the contribution agg
        val all = p.collect { case e: ShuffleExchangeLike => e }
        assert(all.size <= 1, s"expected at most 1 exchange per round:\n$p")
      }
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.listenerManager.unregister(listener)
    }
  }

  test("symmetric cycle converges to equal ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, iters = 30)
    val vs = got.values.toSeq
    assert(vs.max - vs.min < 1e-6)
    // no dangling nodes: total mass conserved at |V|
    assert(math.abs(vs.sum - 3.0) < 1e-6)
  }

  test("personalizedRanks: rank flows only from the seeds — an " +
      "interlinked cluster unreachable from them scores zero") {
    import spark.implicits._
    // seeds {1}; 1→2→3; spam clique {10,11,12} fully interlinked,
    // 10→1 (points AT the trusted side, gets nothing back)
    val edges = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (10L, 12L), (11L, 10L), (12L, 11L),
      (10L, 1L)
    ).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = PageRank.personalizedRanks(edges, seeds, iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the spam clique inflates plain PageRank but holds ZERO
    // personalized mass (no path from seed 1 into it)
    assert(got(10L) == 0.0 && got(11L) == 0.0 && got(12L) == 0.0)
    assert(got(1L) > 0.0 && got(2L) > 0.0 && got(3L) > 0.0)
    // seed teleport: rank(1) ≥ 0.15 always; chain decays
    assert(got(1L) >= 0.15 && got(2L) < got(1L) && got(3L) < got(2L))
    val plain = PageRank.ranks(edges, iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain(10L) > plain(3L),
      "plain PageRank falls for the interlinked cluster")

    // differential vs an in-memory iteration on the q200 graph shape
    import org.apache.spark.sql.functions.{explode, array, pmod, lit}
    val docs = graft.Tables.documents(spark, sf0001)
    val big = docs.select($"doc_id".as("src"),
      explode(array((0 until 3).map(k =>
        pmod($"doc_id" * 7919 + lit(k), lit(100))): _*)).as("dst"))
    val seeds10 = spark.range(0, 5).select($"id".as("node"))
    val gotBig = PageRank.personalizedRanks(big, seeds10, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val es = big.distinct().as[(Long, Long)].collect()
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val deg = es.groupBy(_._1).view.mapValues(_.length).toMap
    val tp = nodes.map(v => v -> (if (v < 5) 0.15 else 0.0)).toMap
    var r = tp
    for (_ <- 1 to 3) {
      val in = es.groupBy(_._2).map { case (v, inc) =>
        v -> inc.map(e => r(e._1) / deg(e._1)).sum }
      r = nodes.map(v => v -> (tp(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    nodes.foreach(v => assert(math.abs(gotBig(v) - r(v)) < 1e-9, s"v=$v"))
  }
}
