package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.llmops.VersionedIndex

/** Version-aware stream enrichment against a
  * [[graft.io.VersionedTable]] root (X217) — the live half of the
  * X207 story, on the [[AnnServe]] freshness pattern: a plain
  * stream-static join binds the dimension ONCE at stream start, so a
  * dimension publish mid-stream either never surfaces or (worse,
  * with an in-place overwrite) tears a batch. Here each micro-batch
  * re-resolves the pointer — ONE `_ptr` directory listing, a metadata
  * read — and re-reads the snapshot only when the version actually
  * changed, so `VersionedTable.publish` mid-stream enriches from the
  * new version on the NEXT batch with no restart, and a batch racing
  * the flip reads old or new bit-exactly, never torn state.
  *
  * State: none (the served version is plain driver-side memoization —
  * foreachBatch runs on the single stream-execution thread).
  * Exactly-once is the sink's usual foreachBatch contract.
  */
object TableServe {

  /** Build the enrichment writer: each stream micro-batch is
    * broadcast-joined with the CURRENT snapshot of `root` and handed
    * to `sink` with its batch id; an `enrich_version` column carries
    * the snapshot version each row was served from. Call `.start()`
    * to begin.
    */
  def enrich(spark: SparkSession, root: String, stream: DataFrame,
             joinKeys: Seq[String], joinType: String = "left")
            (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(joinKeys.nonEmpty, "joinKeys must be non-empty")
    // single stream-execution thread: no synchronization needed
    var servedVersion = -1
    var dim: DataFrame = null
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val v = VersionedIndex.current(spark, root).getOrElse(
          throw new IllegalStateException(
            s"$root has no published version — publish one before serving"))
        if (v != servedVersion) {
          servedVersion = v
          dim = spark.read.parquet(VersionedIndex.versionPath(root, v))
        }
        sink(batch.join(broadcast(dim), joinKeys, joinType)
          .withColumn("enrich_version", lit(servedVersion)), batchId)
      }
    }
  }
}
