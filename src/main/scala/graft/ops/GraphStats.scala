package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph health report (X215) next to the per-node family
  * (PageRank X80, HITS X144, triangles X151, k-core X170): two scalar
  * diagnostics a link-graph pipeline reads before trusting
  * graph-derived features at all —
  *
  *  - **reciprocity** (Newman 2002): the share of directed edges whose
  *    reverse also exists. Web link graphs sit near 0 (links are
  *    citations), social graphs near 1 (follows reciprocate); a crawl
  *    whose reciprocity jumps between snapshots usually ingested a
  *    mirror or a template farm.
  *  - **degree assortativity** (Newman 2003, the out–in flavor):
  *    Pearson correlation over edges of (out-degree(src),
  *    in-degree(dst)). Positive = hubs link hubs (spam rings,
  *    link exchanges); negative = hubs link leaves (organic
  *    hierarchies). Pearson r is scale-free, so the sample/population
  *    variance convention cancels and any engine replays it.
  *
  * Shape: one distinct-edge dedup (the only full-width shuffle — and
  * the rows are two longs), two slim degree aggregates joined back on
  * the uniform src/dst keys, one LEFT SEMI against the reversed edge
  * set for reciprocity, one `corr` aggregate. Self-loops are counted,
  * excluded from both metrics (a self-loop is trivially reciprocal
  * and correlates a node with itself), and reported.
  */
object GraphStats {

  /** @return one row: (n_edges, n_self_loops, reciprocity,
    *         assortativity) — metrics over distinct non-self edges,
    *         4dp; assortativity null when degenerate (all degrees
    *         equal — zero variance has no correlation)
    */
  def healthReport(edges: DataFrame, srcCol: String = "src",
                   dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
      .where(col("s").isNotNull && col("t").isNotNull)
      .distinct()
    val nonSelf = e.where(col("s") =!= col("t"))
    val rev = nonSelf.select(col("t").as("s"), col("s").as("t"))
    val recip = nonSelf.join(rev, Seq("s", "t"), "left_semi")
      .agg(count(lit(1)).as("__r"))
    val outDeg = nonSelf.groupBy(col("s"))
      .agg(count(lit(1)).as("__out"))
    val inDeg = nonSelf.groupBy(col("t"))
      .agg(count(lit(1)).as("__in"))
    val perEdge = nonSelf
      .join(outDeg, Seq("s"))
      .join(inDeg, Seq("t"))
    val counts = e.agg(
      count(lit(1)).as("n_edges"),
      sum(when(col("s") === col("t"), 1L).otherwise(0L))
        .as("n_self_loops"))
    // Pearson r by the moment formula with explicit zero-variance
    // guards — Spark's `corr` divides by zero under ANSI on a
    // constant-degree side, and the moment form is what the oracle
    // mirrors term by term
    val assort = perEdge
      .select(col("__out").cast("double").as("__x"),
        col("__in").cast("double").as("__y"))
      .agg(
        count(lit(1)).cast("double").as("__ns"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val vx = col("__ns") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("__ns") * col("__syy") - col("__sy") * col("__sy")
    counts.crossJoin(recip).crossJoin(assort)
      .select(col("n_edges"), col("n_self_loops"),
        round(when(col("__ns") > 0,
          col("__r") / col("__ns")).otherwise(lit(0.0)), 4)
          .as("reciprocity"),
        round(when(vx > 0 && vy > 0,
          (col("__ns") * col("__sxy") - col("__sx") * col("__sy")) /
            sqrt(vx * vy)), 4).as("assortativity"))
  }
}
