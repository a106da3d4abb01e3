package graft.llmops

import graft.SparkTestBase

/** [[DedupPlan]] — the one-call dedup-tier advisor. Each scenario
  * plants a corpus whose duplication shape has a known right answer
  * and asserts both the verdict and the evidence fields behind it.
  * All probes run at sampleRate = 1.0 for determinism.
  */
class DedupPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def wordsDoc(seed: Int, n: Int = 60): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 500}x$i").mkString(" ")

  test("exact-copy corpus recommends the exact tier with skew evidence") {
    val base = (0 until 20).map(i => (i.toLong, wordsDoc(i)))
    // one 40-copy boilerplate cluster — the skew shape
    val copies = (100 until 140).map(i => (i.toLong, wordsDoc(0)))
    val docs = (base ++ copies).toDF("doc_id", "text")
    val p = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0)
    assert(p.recommendedTier == "exact", p.reason)
    assert(p.nDocs == 60)
    assert(p.exactDupRate > 0.5 && p.exactDupRate < 0.8,
      s"exactDupRate=${p.exactDupRate}")
    // Misra-Gries lower bound: est >= true(41) - n/(k+1) = 41 - 60/33
    assert(p.maxExactClusterLb >= 39, s"clusterLb=${p.maxExactClusterLb}")
    assert(p.estNearDupDocRate < 0.01, s"nearDup=${p.estNearDupDocRate}")
  }

  test("unique corpus with no duplication recommends exact (free tier)") {
    val docs = (0 until 50).map(i => (i.toLong, wordsDoc(i)))
      .toDF("doc_id", "text")
    val p = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0)
    assert(p.recommendedTier == "exact", p.reason)
    assert(p.exactDupRate < 0.05)
    assert(p.estNearDupPairs == 0L)
  }

  test("near-dup corpus recommends ssjoin inside the budget, lsh outside") {
    // 25 pairs of high-Jaccard variants (one word in ~30 changed)
    val docs = (0 until 25).flatMap { i =>
      val words = wordsDoc(i, 40).split(" ")
      val variant = words.updated(17, "CHANGEDTOKEN").mkString(" ")
      Seq((i.toLong * 2, words.mkString(" ")), (i.toLong * 2 + 1, variant))
    }.toDF("doc_id", "text")
    val affordable = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0)
    assert(affordable.recommendedTier == "ssjoin", affordable.reason)
    assert(affordable.estNearDupPairs >= 20L,
      s"pairs=${affordable.estNearDupPairs}")
    assert(affordable.estNearDupDocRate > 0.5)
    val dense = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0,
      ssjoinBudget = 0.0)
    assert(dense.recommendedTier == "lsh", dense.reason)
    assert(dense.bands >= 1 && dense.rowsPerBand >= 1)
    assert(math.abs(dense.effectiveThreshold - 0.7) < 0.15,
      s"midpoint=${dense.effectiveThreshold}")
  }

  test("prefix-shaped corpus recommends the containment tier") {
    // full docs plus their 60% prefixes: Jaccard ≈ 0.55 (below the
    // 0.7 threshold — the Jaccard tier misses every pair), while
    // containment of the prefix in the full doc ≈ 1.0
    val docs = (0 until 20).flatMap { i =>
      val words = wordsDoc(i, 50).split(" ")
      Seq((i.toLong * 2, words.mkString(" ")),
        (i.toLong * 2 + 1, words.take(30).mkString(" ")))
    }.toDF("doc_id", "text")
    val p = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0)
    assert(p.recommendedTier == "containment", p.reason)
    assert(p.containmentExtraRate > 0.3,
      s"containmentExtra=${p.containmentExtraRate}")
    assert(p.estNearDupDocRate < p.containmentExtraRate * 2)
  }

  test("sampling scales pair estimates back to full size") {
    // 200 identical-pair groups; sample at 0.5 — the estimator
    // should land within a loose band of the true 200 pairs
    val docs = (0 until 200).flatMap { i =>
      val words = wordsDoc(i, 40).split(" ")
      val variant = words.updated(9, "VARIANTTOKEN").mkString(" ")
      Seq((i.toLong * 2, words.mkString(" ")), (i.toLong * 2 + 1, variant))
    }.toDF("doc_id", "text")
    val p = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 0.5)
    assert(p.sampledDocs < p.nDocs)
    // 1/p² scaling on a pairwise corpus: expect ~200 ± wide noise
    assert(p.estNearDupPairs > 60L && p.estNearDupPairs < 600L,
      s"estPairs=${p.estNearDupPairs}")
  }

  test("empty input recommends exact without dividing by zero") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val p = DedupPlan.plan(docs, threshold = 0.7, sampleRate = 1.0)
    assert(p.recommendedTier == "exact")
    assert(p.nDocs == 0 && p.estCandidatePairs == 0L)
  }
}
