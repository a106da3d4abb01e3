package graft.llmops

/** LSH parameter planning for the banded MinHash joins
  * ([[Dedup.minhashPairs]] / [[Dedup.contaminationPairs]] and the
  * incremental/streaming variants built on them).
  *
  * The banded construction's collision probability at Jaccard
  * similarity s is the classic S-curve  P(s) = 1 − (1 − s^r)^b
  * (b bands of r rows; Broder 1997, the standard LSH analysis in
  * Mining of Massive Datasets ch. 3). Its inflection sits near
  * (1/b)^(1/r), so choosing (b, r) IS choosing the dedup threshold —
  * users who change `threshold` without re-planning (b, r) silently
  * get a different operating point. This module makes the choice
  * explicit and testable:
  *
  *  - [[collisionProbability]] — the curve itself, the quantity every
  *    recall claim in SCALING.md's dedup sections reduces to;
  *  - [[plan]] — pick, among all (b, r) with b·r ≤ maxHashes, the
  *    split whose curve best matches an ideal step at `threshold`
  *    (minimizing false-negative area above the threshold plus
  *    false-positive area below it, a plain trapezoid integral);
  *  - [[Plan.collisionProbabilityAt]] — what the chosen split
  *    actually delivers at a given similarity (recall above the
  *    threshold, false-positive rate below it).
  *
  * Everything is driver-side closed-form arithmetic over O(maxHashes)
  * candidate splits — nothing touches data; the cluster-side cost of
  * the chosen plan is b slim band rows per document, exactly as
  * measured for the fixed (16, 8) default.
  */
object LshPlan {

  /** P(band collision) = 1 − (1 − s^r)^b for Jaccard similarity s. */
  def collisionProbability(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(bands >= 1 && rowsPerBand >= 1, "bands and rows must be >= 1")
    require(s >= 0.0 && s <= 1.0, "similarity must be in [0, 1]")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)
  }

  /** A chosen split with its delivered operating characteristics. */
  final case class Plan(bands: Int, rowsPerBand: Int, threshold: Double) {
    def nHashes: Int = bands * rowsPerBand
    /** Similarity where the S-curve crosses 1/2 — the effective
      * threshold the join actually implements. */
    def effectiveThreshold: Double =
      math.pow(1.0 - math.pow(0.5, 1.0 / bands), 1.0 / rowsPerBand)
    /** The split's S-curve at similarity s — ONE function with two
      * readings: above the threshold it is the expected recall (P a
      * true pair reaches the verify stage); below it, the expected
      * false-positive rate (P a non-pair costs a verify comparison).
      * A single accessor on purpose: the former `expectedRecall` /
      * `expectedFalsePositiveRate` pair had identical bodies, which
      * invited the misreading that the FP variant incorporated the
      * threshold or returned a complement.
      */
    def collisionProbabilityAt(s: Double): Double =
      collisionProbability(s, bands, rowsPerBand)
  }

  /** Choose (b, r) with b·r ≤ `maxHashes` whose S-curve minimizes the
    * deviation from the ideal step at `threshold`: the integral of
    * P(s) below the threshold (false-positive mass) plus the integral
    * of 1 − P(s) above it (false-negative mass), each by trapezoid
    * rule on a fixed grid. Deterministic; ties break toward fewer
    * hashes (cheaper signatures), then more bands (higher recall at
    * the threshold itself).
    */
  def plan(threshold: Double, maxHashes: Int = 128,
           grid: Int = 200): Plan = {
    require(threshold > 0.0 && threshold < 1.0, "threshold in (0, 1)")
    require(maxHashes >= 1, "maxHashes must be >= 1")
    val candidates = for {
      r <- 1 to maxHashes
      b <- 1 to maxHashes / r
    } yield (b, r)
    def cost(b: Int, r: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < grid) {
        val s0 = i.toDouble / grid
        val s1 = (i + 1).toDouble / grid
        def err(s: Double): Double = {
          val p = collisionProbability(s, b, r)
          if (s < threshold) p else 1.0 - p
        }
        acc += (err(s0) + err(s1)) / 2 / grid
        i += 1
      }
      acc
    }
    val (b, r) = candidates.minBy { case (b, r) =>
      (cost(b, r), b * r, -b)
    }
    Plan(b, r, threshold)
  }
}
