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
    statsRow(docs, textCol, "base")
      .write.mode("overwrite").parquet(s"$path/stats")
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** One additive stats row for a document batch: (n_docs, sum_dl,
    * batch). Docs with empty/whitespace text count toward n (they are
    * corpus members with dl = 0), exactly like [[Bm25.scores]]' stats
    * pass. The `batch` tag exists so a replayed partial append (crash
    * between the postings and stats writes) dedupes at serve time
    * instead of permanently double-counting.
    */
  private def statsRow(docs: DataFrame, textCol: String,
                       batchTag: String): DataFrame =
    docs.select(TextFuncs.tokenCount(col(textCol))
        .cast("double").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("batch", lit(batchTag))

  /** Incremental growth: new docs' postings append into their term
    * buckets, plus one more additive stats row — no rewrite, the index
    * stays serveable throughout, df/avgdl reflect the union on the
    * next query.
    *
    * Crash-safety: the two appends are not one transaction, so a
    * replay after a crash between them can re-append. Both stores
    * dedupe at SERVE time — posting rows by the (id, term) uniqueness
    * contract, stats rows by `batchTag` — so a replayed
    * [[ingestStream]] batch (which passes its deterministic batch id)
    * never corrupts served scores. Manual calls get a fresh tag per
    * invocation (two deliberate appends must both count).
    */
  def append(newDocs: DataFrame, path: String,
             idCol: String = "doc_id", textCol: String = "text",
             batchTag: String = java.util.UUID.randomUUID().toString)
      : Unit = {
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
    statsRow(newDocs, textCol, batchTag)
      .write.mode("append").parquet(s"$path/stats")
  }

  /** Streaming growth: a document stream appends postings + stats per
    * micro-batch behind the [[BatchLedger]] (committed batches never
    * replay). A crash BETWEEN a batch's postings and stats appends is
    * also harmless: the replay passes the same deterministic
    * `stream-<batchId>` tag, and [[scores]] dedupes posting rows by
    * (id, term) and stats rows by tag — so the crash window degrades
    * to a retried no-op, never a double count.
    */
  def ingestStream(docs: DataFrame, path: String,
                   idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    BatchLedger.guarded(docs, path) { (batch, batchId) =>
      append(batch, path, idCol, textCol, batchTag = s"stream-$batchId")
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
    val qTerms = Bm25.queryTerms(queries, queryIdCol, queryTextCol)
      .localCheckpoint(false) // tiny; read thrice (buckets, join, fan-out)
    val buckets = qTerms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).as("b"))
      .distinct().as[Long].collect().toSeq
    // additive stats rows sum to the union corpus; a `batch` tag (new
    // layouts) dedupes crash-window replays of the same ingest batch
    val statsRaw = spark.read.parquet(s"$path/stats")
    val stats = (if (statsRaw.columns.contains("batch"))
        statsRaw.dropDuplicates("batch") else statsRaw)
      .agg(sum(col("n_docs")).cast("double").as("n"),
        (sum(col("sum_dl")) / sum(col("n_docs"))).as("avgdl"))
    val uniqTerms = qTerms.select(col("term")).distinct()
    // (id, term) is unique by the id-uniqueness contract, so exact
    // duplicate posting rows can only be a replayed partial append —
    // dropDuplicates on the SLIM matched set makes the crash window
    // harmless at serve time
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("term_bucket").isin(buckets: _*)) // partition pruning
      .join(broadcast(uniqTerms), Seq("term"))
      .select(col("id"), col("term"), col("tf"), col("dl"))
      .dropDuplicates("id", "term")
    Bm25.contribs(tf, stats, k1, b)
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("__qid"), col("id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib")).as("score"))
      .withColumnRenamed("__qid", queryIdCol)
      .withColumnRenamed("id", idCol)
  }

  /** Per-query top-k over [[scores]] — [[Bm25.rankTail]], the same
    * 4-decimal round / bounded-heap rank / metadata join-back every
    * other BM25 top-k uses. Returns (queryIdCol, rk, idCol,
    * n_terms_hit, score).
    */
  def topK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id",
           queryIdCol: String = "query_id",
           queryTextCol: String = "text"): DataFrame =
    Bm25.rankTail(scores(spark, path, queries, k1, b, idCol,
      queryIdCol, queryTextCol), k, queryIdCol, idCol)
}
