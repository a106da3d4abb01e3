package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-propagation community detection (LPA; Raghavan et al. 2007)
  * over an undirected link graph — the modularity-flavored
  * counterpart to [[ConnectedComponents]]: components answer "can
  * these pages reach each other at all", LPA answers "which pages
  * form a densely self-linking neighborhood", the unit a crawl
  * pipeline samples, caps, and quality-scores as one site-cluster
  * even when a stray link bridges two of them.
  *
  * SYNCHRONOUS, deterministic variant: every node simultaneously
  * adopts the most frequent label among its neighbors' previous-round
  * labels, ties broken toward the SMALLEST label, isolated nodes keep
  * their own. The classic asynchronous LPA is order-dependent (its
  * known reproducibility defect); the synchronous rule is a pure
  * function of the previous labeling, so reruns agree and a
  * relational oracle can replay every round as two joins and an
  * argmax (q207 unrolls it). Synchronous LPA can two-cycle on
  * bipartite-ish regions — `iterations` is a hard cap, not a
  * convergence promise, exactly like [[PageRank.ranks]]' fixed
  * iteration count.
  *
  * Scale shape: each round is one shuffle — edges join the label
  * table on the neighbor key (the label table is (node, label), slim
  * by construction), then a map-side-combinable count per
  * (node, label) and a struct-argmax per node. Labels are
  * localCheckpoint'd per round so lineage stays O(1) (the
  * [[KCore]]/[[ConnectedComponents]] arrangement); total cost is
  * `iterations` × one edge-sized exchange of 16-byte rows, never the
  * payload.
  */
object Communities {

  /** @return (node, label): `label` = community id (the smallest node
    *         id that won the node's neighborhood vote in the final
    *         round). Self-loops dropped, parallel edges collapse,
    *         direction ignored.
    */
  def labelPropagation(edges: DataFrame, iterations: Int = 3,
                       srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._

    val canon = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .distinct()
    val sym = canon.unionByName(canon.select($"v".as("u"), $"u".as("v")))
      .localCheckpoint(true)
    val nodes = sym.select($"u".as("node")).distinct()

    var labels = nodes.select($"node", $"node".as("label"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      // neighbor labels: one slim join on the neighbor key, then the
      // (most-frequent, then smallest) vote as a single struct argmax
      val voted = sym
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy($"u", $"label").agg(count(lit(1)).as("n"))
        .groupBy($"u")
        .agg(max(struct($"n", (-$"label").as("neg"))).as("win"))
        .select($"u".as("node"), (-$"win.neg").as("label"))
      // isolated nodes never appear in `sym`; keep their own label
      labels = labels.select($"node").join(voted, Seq("node"), "left")
        .select($"node",
          coalesce($"label", $"node").as("label"))
        .localCheckpoint(true)
      i += 1
    }
    labels
  }

  /** Community-quality report (X199): Newman modularity per community
    * plus conductance — the evaluation half [[labelPropagation]] (or
    * any labeling: components, k-core shells, an external clustering)
    * needs before anyone ACTS on the communities. Modularity
    * Q = Σ_c [ m_c/m − (d_c/2m)² ] (Newman & Girvan 2004): intra-edge
    * mass beyond what random wiring with the same degrees predicts;
    * conductance φ(c) = cut(c) / min(vol(c), 2m − vol(c)) is the
    * bottleneck view (low = well-separated). Q rides every row as a
    * constant column so the scalar travels with the frame.
    *
    * All relational over slim frames: one labeled-edge join (labels
    * broadcast onto the canonical edge list), two aggregates. Edges
    * canonicalize exactly like [[labelPropagation]]; nodes missing
    * from `labels` form their own singleton communities (zero volume
    * contribution only if also edge-free).
    *
    * @param labels (node, label)
    * @return per community: (label, n_nodes, intra_edges, cut_edges,
    *         degree_sum, conductance, contribution, modularity) —
    *         4dp on the ratios
    */
  def communityReport(edges: DataFrame, labels: DataFrame,
                      srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .distinct()
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label"))
    val labeled = canon
      .join(lab.select($"node".as("u"), $"label".as("lu")), Seq("u"))
      .join(lab.select($"node".as("v"), $"label".as("lv")), Seq("v"))
      .localCheckpoint(false)
    val m = labeled.count().toDouble
    val intra = labeled.filter($"lu" === $"lv")
      .groupBy($"lu".as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    val cuts = labeled.filter($"lu" =!= $"lv")
      .select(explode(array($"lu", $"lv")).as("label"))
      .groupBy($"label").agg(count(lit(1)).as("cut_edges"))
    val vol = labeled
      .select(explode(array($"lu", $"lv")).as("label"))
      .groupBy($"label").agg(count(lit(1)).as("degree_sum"))
    val sizes = lab.groupBy($"label").agg(count(lit(1)).as("n_nodes"))
    val per = sizes
      .join(intra, Seq("label"), "left")
      .join(cuts, Seq("label"), "left")
      .join(vol, Seq("label"), "left")
      .select($"label", $"n_nodes",
        coalesce($"intra_edges", lit(0L)).as("intra_edges"),
        coalesce($"cut_edges", lit(0L)).as("cut_edges"),
        coalesce($"degree_sum", lit(0L)).as("degree_sum"))
      .withColumn("conductance",
        when($"cut_edges" === 0L, lit(0.0)).otherwise(
          round($"cut_edges" / least($"degree_sum",
            lit(2.0 * m) - $"degree_sum").cast("double"), 4)))
      // + 0.0 normalizes IEEE negative zero: a tiny negative
      // contribution rounds to -0.0, whose textual form differs from
      // 0.0 and breaks cross-engine hash compares
      .withColumn("contribution",
        round($"intra_edges" / lit(m) -
          pow($"degree_sum" / lit(2.0 * m), 2.0), 4) + lit(0.0))
    val q = per.agg((round(sum(
      $"intra_edges" / lit(m) -
        pow($"degree_sum" / lit(2.0 * m), 2.0)), 4) + lit(0.0))
      .as("modularity"))
    per.crossJoin(broadcast(q))
  }
}
