package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, via alternating
  * large-star / small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014).
  *
  * This is the operator that turns near-duplicate PAIRS into duplicate
  * CLUSTERS with exact transitive-closure semantics: `Dedup.minhashDedup`'s
  * lower-endpoint anti-join collapses chains a→b→c correctly only because
  * every chain member pairs with the minimum; when similarity is
  * transitive-but-not-pairwise (a~b, b~c, a≁c), only a component view
  * groups all three. At corpus scale the edge list is the (bounded)
  * output of the LSH pair generators — orders of magnitude smaller than
  * the corpus — and this algorithm needs O(log n) rounds, each a pair of
  * window aggregations partitioned by node id: no driver-side graph, no
  * adjacency materialization, shuffles carry only (long, long) rows.
  *
  * Why not plain min-label propagation: its round count is the graph
  * DIAMETER (a 10M-node chain needs 10M rounds); star contraction
  * halves component height every alternation, so even pathological
  * chains converge in tens of rounds.
  */
object ConnectedComponents {

  /** Large-star: for every node u, connect each strictly-larger
    * neighbor to the minimum of u's closed neighborhood. Input must be
    * the symmetric edge set; output is oriented (big=`u`, small=`v`).
    * One window aggregation partitioned by `u` — a single shuffle.
    */
  private def largeStar(sym: DataFrame): DataFrame = {
    val w = Window.partitionBy("u")
    sym.withColumn("m", least(min(col("v")).over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: with edges oriented big→small, connect every neighbor
    * (and u itself) to the minimum neighbor. Keeps the big→small
    * orientation.
    */
  private def smallStar(oriented: DataFrame): DataFrame = {
    val w = Window.partitionBy("u")
    val withMin = oriented.withColumn("m", min(col("v")).over(w))
    withMin.select(col("v").as("u"), col("m").as("v"))
      .unionByName(withMin.select(col("u"), col("m").as("v")).distinct())
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-insensitive signature of an edge set for the convergence
    * check: (row count, XOR of per-row hashes — overflow-free under
    * ANSI mode and commutative). One cheap aggregate per round; a
    * collision would only ever end iteration a round early, and over a
    * deduplicated 64-bit-hashed edge set that is vanishingly unlikely.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).cast("long"),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Component label (= minimum member id) for every node that appears
    * in `edges`. `edges` needs two numeric id columns `srcCol`/`dstCol`;
    * self-loops and duplicate/reversed edges are tolerated. Returns
    * (id, component).
    *
    * The loop runs on the driver but touches only per-round aggregate
    * signatures — the edge data itself never leaves the cluster. Each
    * round's result is localCheckpointed to truncate lineage (the same
    * executor-loss caveat as Dedup.pinSigs applies; at true scale,
    * checkpoint rounds to reliable storage instead — the round tables
    * are slim (long, long) sets bounded by the input edge count).
    */
  def components(edges: DataFrame, srcCol: String = "id_a",
                 dstCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    val normalized = edges.select(
      greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
      least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    var current = normalized.localCheckpoint(true)
    var sig = signature(current)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val sym = current.unionByName(
        current.select(col("v").as("u"), col("u").as("v")))
      val next = smallStar(largeStar(sym)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      current = next
      sig = nextSig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // At the fixed point every edge points big→root; roots label themselves.
    current.select(col("u").as("id"), col("v").as("component"))
      .unionByName(current.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id").agg(min(col("component")).as("component"))
  }

  /** Cluster every document into its near-duplicate component: docs not
    * involved in any pair become singleton components labeled by their
    * own id. Returns `docs` plus a `component` column.
    */
  def labelClusters(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val labels = components(pairs)
      .withColumnRenamed("id", idCol)
    docs.join(labels, Seq(idCol), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol).cast("long")))
  }

  /** Cluster-aware dedup: keep exactly one representative (the minimum
    * id) per connected component of the near-duplicate pair graph —
    * the transitive-closure-correct counterpart of
    * `Dedup.minhashDedup`'s single-round endpoint rule.
    */
  def dedupByComponent(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id"): DataFrame =
    labelClusters(docs, pairs, idCol)
      .filter(col(idCol).cast("long") === col("component"))
      .drop("component")

  /** Cluster-aware dedup keeping each component's BEST member by the
    * caller's `score` column (quality, length, recency — any
    * deterministic expression over the doc row) instead of the
    * arbitrary minimum id: argmax(score), ties broken toward the
    * smaller id so the pick is total and rerun-stable. The curation
    * difference matters exactly when near-duplicates differ — a clean
    * original vs its ad-littered scrape collapse to ONE doc either
    * way, but only this keeps the clean one.
    *
    * Scale shape: the pick is one `max_by` over slim
    * (component, id, score) rows — the struct ordering
    * (score, −id) encodes the tiebreak, no rank window — and the
    * survivors semi-join back, so full doc rows never shuffle.
    * Singleton docs (in no pair) survive untouched, as in
    * [[dedupByComponent]].
    */
  def dedupByComponentBest(docs: DataFrame, pairs: DataFrame,
                           score: org.apache.spark.sql.Column,
                           idCol: String = "doc_id"): DataFrame = {
    val keep = labelClusters(docs, pairs, idCol)
      .select(col("component"), col(idCol).cast("long").as("__cid"),
        score.as("__s"))
      .groupBy(col("component"))
      .agg(max_by(col("__cid"),
        struct(col("__s").as("s"), (-col("__cid")).as("ni"))).as("__keep"))
      .select(col("__keep"))
    docs.join(keep, docs(idCol).cast("long") === keep("__keep"),
      "left_semi")
  }
}
