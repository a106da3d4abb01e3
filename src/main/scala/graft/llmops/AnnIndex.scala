package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, list-partitioned ANN index — the serving layout for
  * similarity search at corpus scale. [[write]] materializes the
  * corpus as parquet PARTITIONED BY the coarse list id, each row
  * carrying only (id, PQ codes), with the trained models persisted
  * alongside ([[Models]]); [[topK]] then answers query batches by
  * reading ONLY the probed partitions — the probe set becomes a
  * static `list_id IN (...)` partition filter, so Spark's partition
  * pruning drops unprobed lists before a single byte is read
  * (AnnIndexSpec asserts `inputFiles` shrinks accordingly).
  *
  * This is the piece the in-memory `*WithModels` seams don't give
  * you at 100 TB: an nprobe/nlist probe budget there still SCANS the
  * whole code table and filters at the join; here the layout itself
  * enforces it — a 1000-executor query touches nprobe·|queries|
  * partitions of the index, not the corpus. Write once after (re)
  * training; serve any number of query batches, from any session.
  */
object AnnIndex {

  /** Train (or accept) models and write the index: parquet
    * partitioned by `list_id` with (id, codes) rows, plus the models
    * under `path/_models`. Returns the models for immediate reuse.
    */
  def write(corpus: DataFrame, path: String,
            nlist: Int = 16, coarseIters: Int = 2,
            m: Int = 8, codewords: Int = 16, pqIters: Int = 2,
            corpusId: String = "vec_id", corpusVec: String = "embedding")
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val cents =
      if (coarseIters > 0)
        Ivf.kmeansCentroids(corpus, nlist, coarseIters, corpusId, corpusVec)
      else Ivf.sampleCentroids(corpus, nlist, corpusId, corpusVec)
    val books = Ivf.pqCodebooks(corpus, m, codewords, pqIters,
      corpusId, corpusVec)
    writeWithModels(corpus, path, cents, books, corpusId, corpusVec)
    (cents, books)
  }

  /** [[write]] with externally trained models. */
  def writeWithModels(corpus: DataFrame, path: String,
                      centroids: Array[Array[Float]],
                      books: Array[Array[Array[Float]]],
                      corpusId: String = "vec_id",
                      corpusVec: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    corpus.where(col(corpusVec).isNotNull)
      .select(col(corpusId),
        element_at(Ivf.nearest_centroids(col(corpusVec), centroids, 1), 1)
          .as("list_id"),
        Ivf.pqEncode(col(corpusVec), books).as("codes"))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
    Models.saveIvfAdc(spark, s"$path/_models", centroids, books)
  }

  /** Load the persisted models back: (centroids, codebooks). */
  def loadModels(spark: SparkSession, path: String)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) =
    Models.loadIvfAdc(spark, s"$path/_models")

  /** Approximate top-k against a written index. The probed list ids
    * are computed driver-side from the (small, broadcast-bound) query
    * batch and applied as a STATIC partition filter, so the scan
    * plans with `PartitionFilters: list_id IN (...)` and unprobed
    * partitions are never read. Scoring/ranking is identical to
    * [[Ivf.ivfAdcTopKWithModels]] (same LUT scan, same 6-dp rounding,
    * same bounded-heap re-rank) — AnnIndexSpec pins bit-equality.
    */
  def topK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
           nprobe: Int = 4,
           corpusId: String = "vec_id",
           queryId: String = "query_id", queryVec: String = "query_vec",
           impl: String = "agg", scan: String = "lut"): DataFrame = {
    val (cents, books) = loadModels(spark, path)
    topKWithModels(spark, path, queries, k, cents, books, nprobe,
      corpusId, queryId, queryVec, impl, scan)
  }

  /** [[topK]] with pre-loaded models — the seam a long-lived server
    * (e.g. [[graft.streaming.AnnServe]]) uses to load the model tables
    * once and answer every subsequent query batch without re-reading
    * `_models`.
    */
  def topKWithModels(spark: SparkSession, path: String, queries: DataFrame,
                     k: Int, cents: Array[Array[Float]],
                     books: Array[Array[Array[Float]]],
                     nprobe: Int = 4,
                     corpusId: String = "vec_id",
                     queryId: String = "query_id", queryVec: String = "query_vec",
                     impl: String = "agg", scan: String = "lut"): DataFrame = {
    val probes = Ivf.withLut(queries, queryVec, books, scan)
      .withColumn("list_id",
        explode(Ivf.nearest_centroids(col(queryVec), cents, nprobe)))
    // driver-side probe set: ≤ nprobe·|queries| ints — the query
    // batch is broadcast-bound anyway, so this collect is bounded
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val coded = spark.read.parquet(path)
      .filter(col("list_id").isin(probedLists: _*))
    val scored = Ivf.adcScore(coded.join(broadcast(probes), Seq("list_id")),
        books, queryVec, scan)
      .filter(col(corpusId) =!= col(queryId))
      .filter(col("sim").isNotNull)
    VectorFuncs.rerankTopK(scored, k, queryId, corpusId, impl)
  }
}
