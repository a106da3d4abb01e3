package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llmops.AnnIndex

/** Continuous ANN serving: answer a stream of query vectors against a
  * persisted [[graft.llmops.AnnIndex]]. The index is the train-once /
  * serve-many artifact; this is the serve-forever shape on top of it.
  *
  * Why `foreachBatch` and not a stream-static join: the index's whole
  * point is that the probe set becomes a STATIC partition filter
  * (`list_id IN (...)`) so unprobed partitions are never read — and
  * that filter is computed from the query batch, so it can only be
  * planned once a micro-batch is in hand. A stream-static join would
  * plan one scan shape for all batches and read every partition.
  * Inside `foreachBatch` each batch is a plain DataFrame, so serving
  * IS [[AnnIndex.topKWithModels]] — bit-identical to the batch path
  * (AnnServeSpec pins it), with models loaded once at stream start,
  * not per batch.
  *
  * State: none. Every batch is independent; fault tolerance is the
  * sink's concern (foreachBatch re-delivers a batch id on retry, so
  * an idempotent-by-batch-id sink gets exactly-once results).
  */
object AnnServe {

  /** Build the serving writer: each query micro-batch (queryId,
    * queryVec rows) is answered with top-`k` over the index at `path`
    * and handed to `sink` with its batch id. Call `.start()` (after
    * any checkpoint/trigger options) to begin serving.
    *
    * SNAPSHOT-AT-START contract: the models load ONCE here. Vectors
    * appended to the index while the stream runs DO surface (each
    * batch re-plans its partition scan), but a retrain/rewrite of the
    * models at `path` is NOT picked up until the serving stream
    * restarts — restart after [[AnnIndex.writeWithModels]], or point
    * serving at a [[graft.llmops.VersionedIndex]] root's current
    * version and restart on version change.
    */
  def serve(spark: SparkSession, path: String, queries: DataFrame, k: Int,
            nprobe: Int = 4,
            corpusId: String = "vec_id",
            queryId: String = "query_id", queryVec: String = "query_vec",
            impl: String = "agg", scan: String = "lut")
           (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val (cents, books) = AnnIndex.loadModels(spark, path)
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        sink(AnnIndex.topKWithModels(batch.sparkSession, path, batch, k,
          cents, books, nprobe, corpusId, queryId, queryVec, impl, scan),
          batchId)
      }
    }
  }

  /** Continuous HYBRID retrieval serving on a [[graft.llmops.Retrieval]]
    * index: each micro-batch of QUESTIONS (queryId, text rows) is
    * answered by `Retrieval.hybridSearch` — the vector side reads only
    * the probed index partitions, the lexical side only the probed
    * term buckets of the `/lexical` postings — and handed to `sink`
    * with its batch id. Same statelessness/fault contract as [[serve]]:
    * batches are independent, an idempotent-by-batch-id sink gets
    * exactly-once results. The question-in → passages-out loop closed
    * as one running query against purely persisted artifacts.
    *
    * SNAPSHOT-AT-START contract (sharper than [[serve]]'s): the chunk
    * table caches ONCE below, so chunks ingested into the index while
    * this stream runs will match in the ANN/lexical tiers but FAIL the
    * cached chunk join and drop from results silently until the
    * serving stream restarts. Restart the stream after ingest batches
    * land (or serve a [[graft.llmops.VersionedIndex]] current version
    * and restart on version change); a growing-while-serving
    * deployment that cannot restart should trade the cache away and
    * call `Retrieval.hybridSearch` per batch instead.
    */
  def serveHybrid(spark: SparkSession, path: String, questions: DataFrame,
                  k: Int = 5, nprobe: Int = 4, rrfK: Int = 60,
                  queryId: String = "query_id", textCol: String = "text")
                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    // load-once serving discipline (the [[serve]] contract): the chunk
    // table caches at stream start and every micro-batch serves
    // through hybridSearchWith — per-batch cost stays probe-sized, not
    // corpus-sized. The cache lives for the stream's lifetime.
    val chunks = spark.read.parquet(s"$path/chunks").cache()
    questions.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(graft.llmops.Retrieval.hybridSearchWith(batch.sparkSession,
            path, chunks, batch, k, nprobe, rrfK, queryId, textCol),
            batchId)
        }
    }
  }
}
