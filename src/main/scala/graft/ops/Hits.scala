package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities over a link graph — the
  * second centrality axis next to [[PageRank]]: PageRank answers
  * "which pages matter", HITS separates "which pages POINT at what
  * matters" (hubs — link indexes, sitemaps, hub articles) from "which
  * pages ARE what matters" (authorities). For crawl frontiers the hub
  * score is the actionable one: a high-hub page's outlinks are the
  * highest-yield fetches, the structural generalization of the
  * reference's keyword link scoring (`crawler.py` link indicators).
  *
  * Mutual-reinforcement power iteration, fixed rounds:
  * `auth(v) = Σ_{u→v} hub(u)`, normalize; `hub(u) = Σ_{u→v} auth(v)`,
  * normalize. Normalization is by the MAX score (not the sum or L2
  * norm): max is order-independent over doubles, so the result is
  * deterministic under repartitioning and exactly replayable by the
  * q180 oracle — scores land in [0, 1] with the top hub/authority
  * pinned at 1. Each half-round is one join of the pinned edge table
  * with the slim (node, score) table plus one aggregation; the edge
  * table is pinned TWICE, clustered by src for the hub→auth join and
  * by dst for the auth→hub join, so only (long, double) score rows
  * move per round (the [[PageRank]] arrangement, both directions).
  */
object Hits {

  /** (node, hub, authority) for every node appearing in `edges`.
    * Nodes with no out-links get hub 0; no in-links, authority 0.
    */
  def hubsAuthorities(edges: DataFrame, iterations: Int = 2,
                      srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val eBySrc = e.repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint(true)
    val eByDst = e.repartition(col("dst")).sortWithinPartitions("dst")
      .localCheckpoint(true)

    def maxNormalized(scores: DataFrame, c: String): DataFrame = {
      val m = scores.agg(max(col(c)).as("__m"))
      scores.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("__m") > 0.0, col(c) / col("__m"))
            .otherwise(lit(0.0)).as(c))
    }

    var hubs = nodes.withColumn("hub", lit(1.0))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = eBySrc
        .join(hubs, eBySrc("src") === hubs("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("authority"))
      auths = maxNormalized(
        nodes.join(aRaw, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("authority"), lit(0.0)).as("authority")),
        "authority").localCheckpoint(true)
      val hRaw = eByDst
        .join(auths, eByDst("dst") === auths("node"))
        .groupBy(col("src").as("node")).agg(sum(col("authority")).as("hub"))
      hubs = maxNormalized(
        nodes.join(hRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub").localCheckpoint(true)
    }
    nodes.join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("authority"), lit(0.0)).as("authority"))
  }
}
