package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side union-find reference implementation. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCC(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("matches union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 2) {
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(runCC(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("long chain collapses to its minimum in O(log n) rounds") {
    // a 256-node path: plain label propagation would need 256 rounds;
    // star contraction must finish well within the default maxIter=50
    val chain = (0L until 255L).map(i => (i, i + 1))
    val got = runCC(chain)
    assert(got.size == 256 && got.values.forall(_ == 0L))
  }

  test("tolerates self-loops, duplicates, and reversed edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (1L, 2L), (3L, 4L))
    val got = runCC(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty edge set yields empty labeling") {
    assert(runCC(Seq.empty).isEmpty)
  }

  test("labelClusters gives isolated docs singleton components") {
    val docs = Seq((10L, "a"), (11L, "b"), (12L, "c")).toDF("doc_id", "text")
    val pairs = Seq((10L, 12L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.labelClusters(docs, pairs)
      .select($"doc_id", $"component").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 11L, 12L -> 10L))
  }

  test("dedupByComponent keeps exactly one representative per cluster") {
    val docs = (0L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // two clusters {0,1,2} (transitive chain) and {4,5}; 3 and 6 isolated
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents.dedupByComponent(docs, pairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 6L))
  }

  test("transitive chain clusters where single-round endpoint rule differs") {
    // a~b, b~c but NOT a~c: minhashDedup-style lower-endpoint removal
    // keeps a and drops b and c only if (a,c) is an edge; components
    // handles the chain exactly
    val got = runCC(Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupByComponentBest keeps the highest-scoring member, not " +
      "the min id; ties break to the smaller id; singletons survive") {
    val docs = Seq(
      (0L, "low", 0.1), (1L, "best", 0.9), (2L, "mid", 0.5), // cluster A
      (4L, "tie", 0.7), (5L, "tie", 0.7),                    // cluster B
      (6L, "alone", 0.0))                                    // singleton
      .toDF("doc_id", "text", "score")
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents
      .dedupByComponentBest(docs, pairs, col("score"))
      .select($"doc_id").as[Long].collect().toSet
    // cluster A keeps 1 (0.9 beats min-id 0); B's tie keeps min id 4;
    // the zero-score singleton survives untouched
    assert(kept == Set(1L, 4L, 6L))
    // min-id dedup keeps a DIFFERENT, lower-quality doc for A
    val minId = ConnectedComponents.dedupByComponent(docs, pairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(minId == Set(0L, 4L, 6L))
    // rerun over repartitioned input picks identically
    val again = ConnectedComponents
      .dedupByComponentBest(docs.repartition(7), pairs, col("score"))
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept)
  }
}
