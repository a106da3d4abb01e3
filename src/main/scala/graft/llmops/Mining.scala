package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-data mining: hard negatives and training
  * triplets (SURVEY §2.10 X117).
  *
  * Retrieval/embedding trainers (DPR-style dual encoders, sentence
  * embedding models) learn little from random negatives — the model
  * separates them immediately; the gradient signal lives in HARD
  * negatives, the highest-similarity corpus items that are NOT true
  * positives for a query. Mining them is a corpus-scale dataflow:
  * score every (query, doc) pair, remove the known positives, keep the
  * top-k per query.
  *
  * Scale shape: the query batch and the positive pairs broadcast (both
  * are bounded by the training set, the same contract as the ANN
  * broadcast side); the corpus side is one scan — cosine is a codegen
  * kernel projection, the positive removal a broadcast anti-join
  * BEFORE top-k selection (a positive must not occupy a negative
  * slot), and per-query top-k the [[CollectTopK]] bounded heap, so the
  * one exchange carries ≤ partitions·|queries|·k slim rows, never the
  * scored corpus. For corpora where even one scan per mining run is
  * too hot, generate candidates with the IVF index first and pass the
  * candidate subset as `corpus` — the contract is unchanged.
  */
object Mining {

  /** Top-k hard negatives per query: highest-cosine corpus vectors not
    * listed in `positives`. Callers must include the query's own
    * corpus row (if any) in `positives`, or it will surface as a
    * sim≈1.0 "negative".
    *
    * @param corpus    (vec_id, embedding) — unbounded, one scan
    * @param queries   (query_id, embedding) — bounded, broadcast
    * @param positives (query_id, vec_id) true-positive pairs — bounded,
    *                  broadcast
    * @return (query_id, neg_rk, neg_id, neg_sim), neg_rk 1-based by
    *         (sim desc, vec_id asc)
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    positives: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("__qv"))
    corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        VectorFuncs.cosine(col("embedding"), col("__qv")).as("sim"))
      .join(broadcast(positives.select(col("query_id"), col("vec_id"))),
        Seq("query_id", "vec_id"), "left_anti")
      .groupBy(col("query_id"))
      .agg(TopK.topK(col("vec_id"), col("sim"), k).as("__topk"))
      .select(col("query_id"),
        posexplode(col("__topk")).as(Seq("__pos", "__t")))
      .select(col("query_id"), (col("__pos") + 1).cast("int").as("neg_rk"),
        col("__t._1").as("neg_id"), col("__t._2").as("neg_sim"))
  }

  /** (query, positive, hard-negative) training triplets: each mined
    * negative pairs with one positive, assigned round-robin over the
    * query's positives in deterministic (vec_id asc) order — so every
    * negative is used exactly once, positives rotate, and reruns are
    * bit-identical (no RNG).
    *
    * The per-query positive window is bounded by the training set's
    * positives-per-query, never the corpus.
    *
    * @param positives (query_id, vec_id) — the same table mining used
    * @param negatives output of [[hardNegatives]]
    * @return (query_id, pos_id, neg_id, neg_rk, neg_sim)
    */
  def contrastiveTriplets(positives: DataFrame,
                          negatives: DataFrame): DataFrame = {
    val pos = positives
      .select(col("query_id"), col("vec_id").as("pos_id"))
      .withColumn("__pidx",
        (row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("pos_id"))) - 1).cast("long"))
      .withColumn("__np",
        count(lit(1)).over(Window.partitionBy(col("query_id"))))
    negatives
      .join(broadcast(pos),
        negatives("query_id") === pos("query_id") &&
          (negatives("neg_rk").cast("long") - 1) % pos("__np") === pos("__pidx"))
      .select(negatives("query_id"), col("pos_id"), col("neg_id"),
        col("neg_rk"), col("neg_sim"))
  }
}
