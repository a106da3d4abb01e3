package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, bucket-partitioned lexical (BM25) index — the
  * tokenize-once / serve-many seam for the lexical side of retrieval,
  * mirroring [[AnnIndex]]'s lifecycle for the vector side. Every
  * [[Bm25.topKBatch]] call re-tokenizes the corpus; at 100 TB that is
  * the whole cost of the query. [[write]] pays it ONCE: slim posting
  * rows (term, id, tf, dl) land as parquet PARTITIONED BY
  * `term_bucket = pmod(xxhash64(term), nBuckets)`, so a query batch
  * reads only the buckets its terms hash into — the probe set becomes
  * a static partition filter (the [[AnnIndex.topK]] pruning move,
  * applied to postings), and serving cost scales with the matched
  * postings, never the corpus.
  *
  * Corpus statistics (doc count, summed length) persist as additive
  * stats rows: [[append]] writes new docs' postings into their term
  * buckets plus ONE more stats row, and the serve path sums all stats
  * rows — so df (recomputed per term from the postings actually read)
  * and n/avgdl are always consistent with the full written corpus
  * with no rewrite of existing partitions. Id uniqueness across
  * write+appends is the caller's contract, as with any append sink.
  *
  * Score parity: [[scores]] reproduces [[Bm25.scoresBatch]] over the
  * same corpus up to float-summation ORDER (same tf/dl values, stats
  * arithmetic matching Spark's `avg`, same idf/score formulas — but
  * the per-document contribution sum arrives in index-partition
  * order, so totals agree to ~1e-12 relative, not bit-for-bit, the
  * [[Dsir.logwColumn]] contract); the 4-decimal ROUNDED ranking
  * surface of [[topK]] is identical to [[Bm25.topKBatch]]'s. Pinned
  * by Bm25IndexSpec; the q136 oracle replays serving from the
  * written files alone.
  */
object Bm25Index {

  /** Build the index at `path`: `path/postings` (partitioned by
    * term_bucket), `path/stats` (one additive row), `path/params`
    * (nBuckets — queries must hash into the same bucket space).
    */
  def write(docs: DataFrame, path: String, nBuckets: Int = 64,
            idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    Bm25.requireIntegralId(docs, idCol, "doc")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("id"),
        TextFuncs.tokenCount(col(textCol)).cast("double").as("dl"),
        explode(TextFuncs.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
      // co-locate each bucket before the partitioned write: without
      // this every task writes a sliver of every bucket —
      // tasks x buckets files, the classic small-files explosion; with
      // it each bucket lands as one file per write
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$path/postings")
    statsRow(docs, textCol)
      .write.mode("overwrite").parquet(s"$path/stats")
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** One additive stats row for a document batch: (n_docs, sum_dl).
    * Docs with empty/whitespace text count toward n (they are corpus
    * members with dl = 0), exactly like [[Bm25.scores]]' stats pass.
    */
  private def statsRow(docs: DataFrame, textCol: String): DataFrame =
    docs.select(TextFuncs.tokenCount(col(textCol))
        .cast("double").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Incremental growth: new docs' postings append into their term
    * buckets, plus one more additive stats row — no rewrite, the index
    * stays serveable throughout, df/avgdl reflect the union on the
    * next query.
    */
  def append(newDocs: DataFrame, path: String,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Bm25.requireIntegralId(newDocs, idCol, "doc")
    val spark = newDocs.sparkSession
    val nBuckets = spark.read.parquet(s"$path/params")
      .select(col("n_buckets")).head().getInt(0)
    newDocs.select(col(idCol).as("id"),
        TextFuncs.tokenCount(col(textCol)).cast("double").as("dl"),
        explode(TextFuncs.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(nBuckets)))
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$path/postings")
    statsRow(newDocs, textCol)
      .write.mode("append").parquet(s"$path/stats")
  }

  /** Streaming growth: a document stream appends postings + stats per
    * micro-batch, so the lexical index tracks a landing corpus
    * continuously — the [[Retrieval.ingestStream]] pattern, with the
    * same `_batches` ledger making foreachBatch's at-least-once replay
    * a no-op (a replayed batch id is skipped, so postings and stats
    * never double-append; the ledger row lands LAST).
    */
  def ingestStream(docs: DataFrame, path: String,
                   idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val seen =
          try spark.read.parquet(s"$path/_batches")
            .filter(col("batch_id") === batchId).limit(1).count() > 0
          catch {
            case _: org.apache.spark.sql.AnalysisException => false
          }
        if (!seen) {
          append(batch, path, idCol, textCol)
          Seq(batchId).toDF("batch_id")
            .write.mode("append").parquet(s"$path/_batches")
        }
    }

  /** Multi-query BM25 scores served from the written index: the query
    * batch's distinct terms resolve to their buckets DRIVER-side (the
    * term set is broadcast-bounded by construction), the postings scan
    * plans with a static `term_bucket IN (...)` partition filter, and
    * everything downstream — df from the read postings, idf, per-term
    * contributions, per-query fan-out — is the [[Bm25.scoresBatch]]
    * dataflow over the PERSISTED slim rows. Returns
    * (queryIdCol, idCol, n_terms_hit, score).
    */
  def scores(spark: SparkSession, path: String, queries: DataFrame,
             k1: Double = 1.2, b: Double = 0.75,
             idCol: String = "doc_id",
             queryIdCol: String = "query_id",
             queryTextCol: String = "text"): DataFrame = {
    import spark.implicits._
    Bm25.requireIntegralId(queries, queryIdCol, "query")
    val nBuckets = spark.read.parquet(s"$path/params")
      .select(col("n_buckets")).head().getInt(0)
    val qTerms = queries
      .filter(col(queryIdCol).isNotNull && col(queryTextCol).isNotNull)
      .select(col(queryIdCol).cast("long").as("__qid"),
        explode(TextFuncs.tokens(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .localCheckpoint(false) // tiny; read thrice (buckets, join, fan-out)
    val buckets = qTerms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).as("b"))
      .distinct().as[Long].collect().toSeq
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).cast("double").as("n"),
        (sum(col("sum_dl")) / sum(col("n_docs"))).as("avgdl"))
    val uniqTerms = qTerms.select(col("term")).distinct()
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("term_bucket").isin(buckets: _*)) // partition pruning
      .join(broadcast(uniqTerms), Seq("term"))
      .select(col("id"), col("term"), col("tf"), col("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = df.crossJoin(broadcast(stats.select(col("n"))))
      .select(col("term"),
        log(lit(1.0) + (col("n") - col("df") + 0.5) /
          (col("df") + 0.5)).as("idf"))
    tf.join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("__qid"), col("id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib")).as("score"))
      .withColumnRenamed("__qid", queryIdCol)
      .withColumnRenamed("id", idCol)
  }

  /** Per-query top-k over [[scores]] — the [[Bm25.topKBatch]] tail
    * (4-decimal round, bounded-heap rank, metadata join-back) over the
    * index-served scores. Returns (queryIdCol, rk, idCol,
    * n_terms_hit, score).
    */
  def topK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id",
           queryIdCol: String = "query_id",
           queryTextCol: String = "text"): DataFrame = {
    val sc = scores(spark, path, queries, k1, b, idCol,
        queryIdCol, queryTextCol)
      .withColumn("score", round(col("score"), 4))
    val top = sc
      .groupBy(col(queryIdCol))
      .agg(TopK.topK(col(idCol).cast("long"), col("score"), k))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol), (col("pos") + 1).cast("int").as("rk"),
        col("col._1").as(idCol))
    sc.join(broadcast(top), Seq(queryIdCol, idCol))
      .select(col(queryIdCol), col("rk"), col(idCol),
        col("n_terms_hit"), col("score"))
  }
}
