package graft.ops

import graft.SparkTestBase

class BfsSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-source min-hop distances; unreachable nodes are absent") {
    //  0-1-2-3-4   and island 9-10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val d = Bfs.distances(edges, seeds, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 2),
      s"depth-2 ball around 0: $d")
    // two seeds: distances take the min over sources
    val d2 = Bfs.distances(edges, Seq(0L, 4L).toDF("node"), maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d2(2L) == 2 && d2(3L) == 1 && d2(4L) == 0, s"$d2")
    assert(!d2.contains(9L) && !d2.contains(10L), "island must be absent")
  }

  test("directed mode walks edges one way only") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val dDir = Bfs.distances(edges, Seq(1L).toDF("node"),
      maxDepth = 3, directed = true)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dDir == Map(1L -> 0, 2L -> 1), s"directed: $dDir")
    val dUndir = Bfs.distances(edges, Seq(1L).toDF("node"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dUndir(3L) == 2, s"undirected reaches 3 via 2: $dUndir")
  }

  test("maxDepth 0 returns exactly the seed set") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val d = Bfs.distances(edges, Seq(1L).toDF("node"), maxDepth = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0))
  }
}
