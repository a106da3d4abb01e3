package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `array<float>` columns, built from
  * Spark's higher-order functions (`zip_with` / `aggregate`) so the hot
  * path stays inside whole-stage codegen — no UDF boxing per element.
  */
object VectorFuncs {

  /** Σ aᵢ·bᵢ as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Brute-force top-k nearest neighbours by cosine similarity.
    *
    * `queries` must be small (it is broadcast); the corpus streams
    * map-side — the only shuffle is the per-query top-k window, which
    * moves k·|queries| candidate rows after partial filtering. This is
    * the exact baseline; [[lshTopK]] is the sublinear variant.
    *
    * Output: (query_id, vec_id, sim, rk).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "query_vec")
      : DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col(corpusId))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rk"))
  }

  /** Random-hyperplane LSH bucket id: sign bit per hyperplane packed
    * into a long. Deterministic pseudo-hyperplanes derived from
    * splitmix64(seed, plane, dim) — no stored model, so the same
    * expression computes the same buckets on any cluster.
    */
  def rhpBucket(vec: Column, planes: Int, seed: Long = 42L): Column = {
    require(planes <= 63, "bucket packed into a long")
    val bits = (0 until planes).map { p =>
      // pseudo-random ±1 weights: sign of mix64(seed ⊕ plane ⊕ dim)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => {
            val h = xxhash64(lit(seed), lit(p), i)
            when(h.bitwiseAND(lit(1L)) === 1L, x.cast("double"))
              .otherwise(-x.cast("double"))
          }),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed by
    * [[rhpBucket]]; candidates = corpus rows sharing the query's bucket
    * (plus optional multi-probe neighbours at Hamming distance 1), then
    * exact cosine re-ranking within the candidate set. At scale the
    * bucket column is a partition key: each query touches 1/2^planes of
    * the corpus instead of all of it.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "query_vec")
      : DataFrame = {
    val cb = corpus.withColumn("bucket", rhpBucket(col(corpusVec), planes))
    // multi-probe: the query's own bucket plus all 1-bit flips
    val probeCols = col("bucket0") +: (0 until planes).map(p =>
      col("bucket0").bitwiseXOR(shiftleft(lit(1L), p)))
    val qb = queries
      .withColumn("bucket0", rhpBucket(col(queryVec), planes))
      .withColumn("bucket", explode(array(probeCols: _*)))
      .drop("bucket0")
      .dropDuplicates(queryId, "bucket")
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col(corpusId))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rk"))
  }
}
