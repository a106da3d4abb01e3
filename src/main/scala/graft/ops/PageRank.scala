package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a link graph — centrality scoring for crawl frontiers
  * (which pages matter structurally, complementing the reference's
  * keyword link scoring) and for near-dup graph analysis.
  *
  * Classic unnormalized damped power iteration:
  * `rank = (1-d) + d * Σ rank_in/outdeg`, a fixed number of rounds.
  * Each round is one join (edges ⋈ ranks on the source node) and one
  * aggregation (sum of contributions per destination) — shuffles carry
  * (long, double) pairs only. The edge+degree table is pinned once and
  * reused every round; rank lineage is cut per round.
  *
  * Partitioning is arranged so the big side never re-shuffles:
  * edges+degrees are hash-partitioned by `src` (and sorted within
  * partitions) BEFORE the lineage cut — `localCheckpoint` captures the
  * physical partitioning/ordering, so every round's edges⋈ranks join
  * sees a pre-clustered, pre-sorted edge side and only moves the
  * (node, rank) table (|V| ≪ |E|). Likewise `nodes` comes out of its
  * `distinct` hash-partitioned by node, and each round's rank table
  * inherits that partitioning through the contribution left-join, so
  * the only unavoidable per-round shuffle is the contribution
  * aggregation itself (hash by destination). On a small input AQE
  * broadcasts the rank side and the point is moot; at cluster scale
  * (edges >> broadcast threshold) this is the difference between
  * shuffling E once ever and shuffling E every round.
  *
  * Dangling nodes (no out-links) leak their damped mass instead of
  * redistributing it — the common simplification for link scoring;
  * ranks still order nodes correctly for frontier prioritization.
  */
object PageRank {

  /** (node, rank) for every node appearing in `edges`. */
  def ranks(edges: DataFrame, iterations: Int = 5, damping: Double = 0.85,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)

    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1 - damping) + lit(damping) * coalesce(col("in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Personalized PageRank (X173) — the TrustRank move: teleport mass
    * returns to a SEED set instead of uniformly, so rank measures
    * proximity to trusted pages. For crawl curation this is the
    * principled version of "does this page matter": a spam cluster
    * can inflate plain PageRank by interlinking, but it cannot
    * manufacture paths FROM the trusted seeds, so its personalized
    * rank stays ~0. Non-seeds get teleport 0; seed teleport mass is
    * (1−d) each (the unnormalized convention matching [[ranks]] —
    * scores order nodes, they are not a probability).
    *
    * Same arrangement as [[ranks]]: the pinned, src-clustered
    * edge+degree table never re-shuffles; per round only (node, rank)
    * pairs move; the seed set joins once into the teleport vector
    * (any size — a broadcast when small, a hash join when the "seed"
    * set is itself large, e.g. an allowlisted domain tier).
    */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame,
                        iterations: Int = 5, damping: Double = 0.85,
                        srcCol: String = "src", dstCol: String = "dst",
                        seedCol: String = "node"): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    val teleport = nodes
      .join(seeds.select(col(seedCol).cast("long").as("node"))
        .distinct().withColumn("__s", lit(1.0)),
        Seq("node"), "left")
      .select(col("node"),
        (lit(1 - damping) * coalesce(col("__s"), lit(0.0))).as("t"))
      .localCheckpoint(true)

    var ranks = teleport.select(col("node"), col("t").as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in"))
      ranks = teleport
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (col("t") + lit(damping) * coalesce(col("in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
