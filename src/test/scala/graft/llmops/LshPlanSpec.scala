package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

class LshPlanSpec extends AnyFunSuite {

  test("collision probability: closed-form identities") {
    // one band, one row: P(s) = s exactly
    assert((0 to 10).forall { i =>
      val s = i / 10.0
      math.abs(LshPlan.collisionProbability(s, 1, 1) - s) < 1e-12
    })
    // b bands of 1 row: P(s) = 1 - (1-s)^b
    assert(math.abs(LshPlan.collisionProbability(0.3, 4, 1) -
      (1 - math.pow(0.7, 4))) < 1e-12)
    // boundaries pinned
    assert(LshPlan.collisionProbability(0.0, 16, 8) == 0.0)
    assert(LshPlan.collisionProbability(1.0, 16, 8) == 1.0)
    // monotone in s
    val ps = (0 to 100).map(i => LshPlan.collisionProbability(i / 100.0, 16, 8))
    assert(ps.sliding(2).forall { case Seq(a, b) => b >= a })
  }

  test("the default (16, 8) split operates near threshold 0.7") {
    val p = LshPlan.Plan(16, 8, 0.7)
    // effective threshold = (1 - 0.5^(1/16))^(1/8) ~ 0.67
    assert(math.abs(p.effectiveThreshold - 0.67) < 0.02)
    assert(LshPlan.collisionProbability(p.effectiveThreshold, 16, 8) - 0.5 < 1e-9)
    // one curve, two readings: high recall above the threshold, low
    // false-positive mass well below it
    assert(p.collisionProbabilityAt(0.85) > 0.95)
    assert(p.collisionProbabilityAt(0.4) < 0.05)
  }

  test("planner picks a split whose operating point matches the ask") {
    for (t <- Seq(0.5, 0.7, 0.9); h <- Seq(64, 128)) {
      val p = LshPlan.plan(t, maxHashes = h)
      assert(p.nHashes <= h)
      assert(math.abs(p.effectiveThreshold - t) < 0.12,
        s"t=$t h=$h -> (${p.bands}, ${p.rowsPerBand}) " +
          s"eff=${p.effectiveThreshold}")
      // strictly better step fit than a deliberately wrong split with
      // the same budget (all rows in one band = recall-everything)
      def stepErr(b: Int, r: Int): Double =
        (0 until 200).map { i =>
          val s = (i + 0.5) / 200
          val pr = LshPlan.collisionProbability(s, b, r)
          if (s < t) pr else 1 - pr
        }.sum / 200
      assert(stepErr(p.bands, p.rowsPerBand) <= stepErr(h, 1) &&
        stepErr(p.bands, p.rowsPerBand) <= stepErr(1, h))
    }
    // determinism
    assert(LshPlan.plan(0.7) == LshPlan.plan(0.7))
  }

  test("planned split actually drives minhashPairs recall on planted dups") {
    // sanity that the planner's output is consumable by the operator:
    // near-identical docs collide, dissimilar ones don't, under the
    // planned (b, r) rather than the hardcoded default
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base + " tail"), // near-dups
      (2L, (100 until 140).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val p = LshPlan.plan(0.7, maxHashes = 128)
    val pairs = Dedup.minhashPairs(docs, threshold = 0.7,
        bands = p.bands, rowsPerBand = p.rowsPerBand)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(x => x._1 == 0L && x._2 == 1L))
    assert(!pairs.exists(x => x._2 == 2L || x._1 == 2L))
  }
}
