package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed retrieval path a user actually runs — text in,
  * persisted searchable index out, questions in, passages out — with
  * nothing external: sentence-aligned chunking (X100), the
  * feature-hash embedder (X101), and the list-partitioned IVF-ADC
  * index (X74) under one directory:
  *
  * {{{
  *   Retrieval.buildIndex(docs, "/idx")          // once
  *   Retrieval.search(spark, "/idx", questions)  // many
  * }}}
  *
  * Layout: `<path>/chunks` (vec_id → doc_id, chunk_idx, chunk_text),
  * `<path>/index` (the ANN index + its models), `<path>/params` (the
  * embedding dim + chunk budget the index was built with — queries
  * MUST embed in the same space, the [[Models]] persistence
  * discipline). Serving reads only the probed index partitions plus
  * the hit rows of the chunk table (a vec_id semi-join — never a
  * chunk-table scan into memory).
  */
object Retrieval {

  /** chunk_idx must fit under this for the composite vec_id to be
    * collision-free: vec_id = doc_id · 1e6 + chunk_idx. A million
    * chunks per document ≈ a 400 MB single document at default budget
    * — beyond any real corpus row.
    */
  private val MaxChunks = 1000000L

  def buildIndex(docs: DataFrame, path: String,
                 targetChars: Int = 400, dim: Int = 256,
                 nlist: Int = 16, m: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val chunks = Chunking.sentenceChunks(docs, targetChars, idCol, textCol)
      .withColumn("vec_id",
        col(idCol) * MaxChunks + col("chunk_idx"))
      .select(col("vec_id"), col(idCol).as("doc_id"),
        col("chunk_idx"), col("chunk_text"))
    chunks.write.mode("overwrite").parquet(s"$path/chunks")
    val persisted = spark.read.parquet(s"$path/chunks")
    val emb = VectorFuncs.hashedEmbedding(persisted, dim,
      idCol = "vec_id", textCol = "chunk_text")
    AnnIndex.write(emb, s"$path/index", nlist = nlist, m = m)
    import spark.implicits._
    Seq((dim, targetChars)).toDF("dim", "target_chars")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** `queries` = (query_id numeric, text); returns one row per hit:
    * (query_id as long, rk, doc_id, chunk_idx, chunk_text, sim).
    * Query ids are remapped to negative longs internally so the
    * index's self-match guard (`vec_id =!= query_id`) can never
    * collide with a corpus vec_id.
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             k: Int = 5, nprobe: Int = 4,
             queryId: String = "query_id",
             textCol: String = "text"): DataFrame = {
    val dim = spark.read.parquet(s"$path/params")
      .select(col("dim")).head().getInt(0)
    val remapped = queries
      .withColumn("__rq", -col(queryId).cast("long") - 1)
    val qVecs = VectorFuncs.hashedEmbedding(remapped, dim,
        idCol = "__rq", textCol = textCol)
      .withColumnRenamed("embedding", "query_vec")
    val hits = AnnIndex.topK(spark, s"$path/index", qVecs, k, nprobe,
      queryId = "__rq")
    hits.join(spark.read.parquet(s"$path/chunks"), Seq("vec_id"))
      .select((-col("__rq") - 1).as(queryId), col("rk"), col("doc_id"),
        col("chunk_idx"), col("chunk_text"), col("sim"))
  }
}
