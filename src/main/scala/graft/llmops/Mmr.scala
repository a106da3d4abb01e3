package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) — the diversification pass between retrieval and
  * consumption: greedily pick
  *
  *   argmax_d  λ·rel(d) − (1−λ)·max_{s ∈ selected} sim(d, s)
  *
  * so the result covers DISTINCT aspects instead of k near-duplicates
  * of the best hit (retrieval-augmented sampling and eval-set
  * construction both want this — a training batch of k copies of one
  * passage is k× the tokens for 1× the signal).
  *
  * Contract: `candidates` is a per-query TOP-N result (bounded by
  * construction — the output of `AnnIndex.topK`, `Retrieval.search`,
  * `Bm25Index.topK` joined to embeddings, …), NEVER a corpus; the
  * greedy runs per query inside `flatMapGroups` over ≤ N rows, so the
  * shuffle carries only candidate rows and the loop is O(k·N) with
  * N·dim floats of state. Greedy selection is inherently sequential —
  * this is the one operator family where per-group imperative code is
  * the honest shape, and bounding N is what makes it distributable.
  *
  * Determinism/replay: relevance and pairwise similarities are
  * rounded to 6 decimals BEFORE entering the mix arithmetic, so the
  * greedy trace is identical in any engine computing the same rounded
  * cosines (the q140 oracle unrolls the picks relationally);
  * ties break on id ascending.
  */
object Mmr {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Left-to-right double accumulation — the [[VectorFuncs.cosine]]
    * kernel's order, which DuckDB's list arithmetic reproduces.
    */
  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    if (a == null || b == null || a.length != b.length) return 0.0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0) 0.0 else dot / den
  }

  /** Re-rank per-query candidates by MMR. Input columns:
    * (queryIdCol, idCol, relCol, vecCol); output
    * (queryIdCol, rk, idCol, mmr_score) with rk dense 1..min(k, N).
    */
  def rerank(candidates: DataFrame, k: Int, lambda: Double = 0.7,
             queryIdCol: String = "query_id", idCol: String = "vec_id",
             relCol: String = "rel", vecCol: String = "embedding")
      : DataFrame = {
    require(k >= 1, "k must be positive")
    require(lambda >= 0 && lambda <= 1, "lambda in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      // null ids cannot survive the (Long, Long, ...) encoder and a
      // NaN relevance is unselectable under every comparison (the
      // greedy would find no pick and crash) — drop both up front,
      // the scoresBatch null-row contract
      .filter(col(queryIdCol).isNotNull && col(idCol).isNotNull &&
        col(relCol).isNotNull && !isnan(col(relCol).cast("double")))
      .select(col(queryIdCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"), col(vecCol))
      .as[(Long, Long, Double, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cand = it.toArray
        val n = cand.length
        val rel = cand.map(c => round6(c._3))
        // max similarity to the SELECTED set — genuinely the max over
        // that set, so a candidate anti-correlated with everything
        // selected gets a negative penalty (i.e. a boost): clamping at
        // 0 would silently flatten the diversity signal for
        // orthogonal-or-opposed candidates
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val taken = new Array[Boolean](n)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Long, Double)]
        val kk = math.min(k, n)
        var step = 0
        while (step < kk) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val penalty = if (step == 0) 0.0 else maxSim(i)
              val s = lambda * rel(i) - (1 - lambda) * penalty
              if (s > bestScore || (s == bestScore && cand(i)._2 < bestId)) {
                best = i; bestScore = s; bestId = cand(i)._2
              }
            }
            i += 1
          }
          taken(best) = true
          out += ((qid, step + 1, cand(best)._2, round6(bestScore)))
          var j = 0
          while (j < n) {
            if (!taken(j)) {
              val s6 = round6(cosine(cand(j)._4, cand(best)._4))
              if (s6 > maxSim(j)) maxSim(j) = s6
            }
            j += 1
          }
          step += 1
        }
        out.iterator
      }
      .toDF(queryIdCol, "rk", idCol, "mmr_score")
  }
}
