package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected link graph — the densest-region
  * extractor next to [[Triangles]] (local cohesion) and
  * [[ConnectedComponents]] (reachability): the k-core is the unique
  * maximal subgraph where every node keeps ≥ k neighbors INSIDE the
  * subgraph. For a crawl corpus the 2-/3-core separates genuinely
  * interlinked content from the tendril mass (pages attached by one
  * or two links — feeds, mirrors, drive-by spam), a standard frontier
  * prioritization and graph-cleanup gate.
  *
  * Algorithm: synchronous peel — each round removes EVERY node whose
  * degree among survivors is < k, until none qualifies. The peel is
  * deterministic (the removed set per round is a pure function of the
  * surviving graph, no ordering choices), and the removal ROUND is
  * returned per node: it is both the useful output (distance from the
  * core, a centrality-ish shell index) and the replay handle — the
  * three peel invariants (see `q190`) pin the kept set to exactly the
  * k-core and force every round label, so a relational engine can
  * verify the full output without recursion.
  *
  * Scale shape: the loop is driver-BOUNDED, data-distributed — each
  * round is one degree aggregation over the surviving edge list plus
  * one anti-join, with the edge frame localCheckpoint'd per round
  * (the [[ConnectedComponents]] arrangement; lineage stays O(1)).
  * Rounds are O(peel depth), in practice tens on web graphs; the
  * `maxRounds` guard throws rather than return a HALF-PEELED graph
  * (a wrong answer, not a budget cut).
  */
object KCore {

  /** @return (node, in_core, round): `round` = 1-based peel round the
    *         node was removed in, null for core members
    *         (`in_core` = true). Self-loops dropped, parallel edges
    *         collapse, direction ignored.
    */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
            dstCol: String = "dst", maxRounds: Int = 200): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._

    val canon = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .distinct()
    val allNodes = canon.select($"u".as("node"))
      .unionByName(canon.select($"v".as("node"))).distinct()
      .localCheckpoint(true)

    var alive = canon.localCheckpoint(true)
    var removed = spark.emptyDataset[(Long, Int)].toDF("node", "round")
    var round = 0
    var done = false
    while (!done) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"k-core peel did not converge in $maxRounds rounds — " +
            "raise maxRounds; a partial peel is not a k-core")
      // degree over survivors; nodes with NO surviving edge are not
      // in `deg` — they are degree 0, always doomed for k >= 1
      val deg = alive.select($"u".as("node"))
        .unionByName(alive.select($"v".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      val survivors = allNodes.join(removed, Seq("node"), "left_anti")
      val doomed = survivors.join(deg, Seq("node"), "left")
        .filter(coalesce($"deg", lit(0L)) < k)
        .select($"node").localCheckpoint(true)
      if (doomed.isEmpty) done = true
      else {
        removed = removed.unionByName(
            doomed.select($"node", lit(round).as("round")))
          .localCheckpoint(true)
        alive = alive
          .join(doomed.select($"node".as("u")), Seq("u"), "left_anti")
          .join(doomed.select($"node".as("v")), Seq("v"), "left_anti")
          .select($"u", $"v").localCheckpoint(true)
      }
    }
    allNodes.join(removed, Seq("node"), "left")
      .select($"node", $"round".isNull.as("in_core"), $"round")
  }
}
