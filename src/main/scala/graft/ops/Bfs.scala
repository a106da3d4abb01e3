package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a link graph — "how far is
  * every page from the seed set", the primitive behind crawl-depth
  * audits (is the frontier actually shallow?), seed-set coverage
  * (which corpus regions are unreachable from the trusted seeds?),
  * and distance-bounded neighborhood extraction for graph features.
  *
  * Frontier iteration, one hop per round: the frontier joins the edge
  * list, discovered nodes join-anti the visited set, both frames are
  * slim (node, dist) pairs — the payload never moves. Rounds are
  * driver-bounded by `maxDepth` (a crawl-shaped graph has small
  * diameter; an unreachable node is reported ABSENT, not infinity —
  * absence composes with left joins, a sentinel does not). Each
  * round's frontier is localCheckpoint'd so lineage stays O(1), the
  * [[KCore]]/[[Communities]] arrangement.
  *
  * The oracle replays this as a recursive min-dist closure capped at
  * `maxDepth` (q208) — BFS from a seed SET is the |seeds|-source
  * product the closure expresses in one recursion, which is why the
  * API takes a seed FRAME, not one id: at 100 TB the seed set is
  * itself a query result (e.g. the trusted-domain winner set), and
  * one multi-source sweep costs the same as a single-source one.
  */
object Bfs {

  /** @return (node, dist): minimum hop count from any seed, seeds at
    *         0; nodes unreachable within `maxDepth` are absent.
    *         `directed = false` (default) walks edges both ways.
    */
  def distances(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 3,
                directed: Boolean = false, srcCol: String = "src",
                dstCol: String = "dst", seedCol: String = "node")
      : DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._

    val fwd = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
    val walk = (if (directed) fwd
                else fwd.unionByName(fwd.select($"v".as("u"), $"u".as("v"))))
      .distinct().localCheckpoint(true)

    var visited = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .select($"node", lit(0).as("dist")).localCheckpoint(true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier.select($"node".as("u"))
        .join(walk, Seq("u"))
        .select($"v".as("node")).distinct()
        .join(visited.select($"node"), Seq("node"), "left_anti")
        .select($"node", lit(depth).as("dist"))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }
}
