package graft.llmops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The `_batches` replay ledger shared by every streaming ingest that
  * appends to a multi-store index ([[Retrieval.ingestStream]],
  * [[Bm25Index.ingestStream]]): foreachBatch is at-least-once, so a
  * batch id already recorded under `<path>/_batches` is skipped and
  * the ledger row lands LAST — a replay of a fully committed batch is
  * a no-op.
  *
  * What the ledger does NOT give: atomicity across the stores inside
  * one batch. A crash between a batch's appends leaves the ledger row
  * unwritten, and the replay re-runs `body` — so `body` must be
  * replay-tolerant (store-level dedupe like [[Bm25Index.scores]]', or
  * a recovery pass like [[Retrieval.compact]]). That contract lives
  * with each caller; this helper owns only the committed-batch skip.
  */
object BatchLedger {

  def guarded(docs: DataFrame, path: String)
             (body: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val seen =
          try spark.read.parquet(s"$path/_batches")
            .filter(col("batch_id") === batchId).limit(1).count() > 0
          catch {
            case _: org.apache.spark.sql.AnalysisException => false
          }
        if (!seen) {
          body(batch, batchId)
          Seq(batchId).toDF("batch_id")
            .write.mode("append").parquet(s"$path/_batches")
        }
    }
}
