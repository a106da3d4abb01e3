package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document into fixed
  * token windows with overlap — the preparation step for context-window
  * training sequences and retrieval indexing (each chunk then flows
  * into the embedding / ANN operators as its own row).
  *
  * Scale shape: a pure narrow column pipeline — tokenize once, generate
  * window starts with `sequence`, `posexplode` into chunk rows. No
  * shuffle, no UDF, whole-stage codegen throughout; output size is
  * input tokens × (window/stride) overlap factor, and the fan-out
  * happens AFTER filters/projections, so Catalyst pushes any downstream
  * chunk predicate to before the explode only when legal. Contrast with
  * [[Packing]] (which concatenates ACROSS documents and needs a window
  * cumsum): chunking is per-document, hence embarrassingly parallel.
  */
object Chunking {

  /** One row per chunk: input columns + (chunk_idx, chunk_text,
    * n_tokens). `windowTokens` is the chunk size, `strideTokens` the
    * step — stride < window gives overlapping chunks, every token
    * appears in at least one chunk, and a trailing window that would
    * only repeat tokens the previous chunk already covered is not
    * emitted (kept iff `start == 0` or the previous window did not
    * reach the end of the document). Whitespace-only documents yield
    * zero chunks. Tokenization is whitespace-split on the trimmed text,
    * original case preserved.
    */
  def slidingChunks(docs: DataFrame, windowTokens: Int, strideTokens: Int,
                    textCol: String = "text"): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "strideTokens must be in [1, windowTokens]")
    val passthrough = docs.columns.filterNot(_ == textCol).map(col)
    docs
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__n", size(col("__toks")))
      .filter(length(trim(col(textCol))) > 0)
      .select(passthrough :+
        col("__toks") :+ col("__n") :+
        posexplode(sequence(lit(0), col("__n") - 1, lit(strideTokens))): _*)
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "__start")
      .filter(col("__start") === 0 ||
        col("__start") + windowTokens - strideTokens < col("__n"))
      .withColumn("chunk_text",
        concat_ws(" ",
          slice(col("__toks"), col("__start") + 1, lit(windowTokens))))
      .withColumn("n_tokens",
        least(lit(windowTokens), col("__n") - col("__start")).cast("int"))
      .drop("__toks", "__n", "__start")
  }

  /** Sentence-aligned chunking for retrieval indexing: sentences stay
    * ATOMIC (a chunk boundary never cuts inside one — the property
    * embedding quality actually depends on), and a sentence opens
    * chunk `floor(charsBefore / targetChars)` — so a chunk runs until
    * the running character count crosses the next `targetChars`
    * multiple and then takes the crossing sentence with it. A chunk
    * can exceed `targetChars` by at most one sentence; both engines
    * replay the assignment from the same cumulative sum, so fates are
    * deterministic. One row per chunk: (id, chunk_idx, chunk_text,
    * n_sentences).
    *
    * Scale shape: one per-document window cumsum (shuffle on the id —
    * the locality any per-doc stage needs anyway) over slim
    * (id, pos, sentence) rows, then a per-chunk reassembly; nothing
    * quadratic, no driver participation.
    */
  def sentenceChunks(docs: DataFrame, targetChars: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(targetChars > 0, "targetChars must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        posexplode(Sentences.sentences(col(textCol))).as(Seq("__pos", "__s")))
      .withColumn("__before",
        coalesce(sum(length(col("__s")) + 1).over(w), lit(0L)))
      .withColumn("chunk_idx",
        floor(col("__before") / targetChars).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__pos"), col("__s")))),
          x => x.getField("__s"))).as("chunk_text"),
        count(lit(1)).cast("int").as("n_sentences"))
  }

  /** Semantic (embedding-drift) chunking (X203): split where the
    * TOPIC moves, not where a byte budget fills — consecutive
    * sentences embed ([[VectorFuncs.hashedEmbedding]], model-free)
    * and a chunk boundary opens where their cosine drops below
    * `minSim`. The RAG-facing upgrade over [[sentenceChunks]]
    * (char-budget) and the token-window chunker: budget chunks cut
    * mid-topic and glue topics together; drift chunks keep each
    * retrievable unit about ONE thing. Same plumbing contract as the
    * other chunkers: sentence order preserved, reassembly by single
    * spaces, documents with no sentences emit nothing.
    *
    * Deterministic and oracle-replayable end to end: md5-hashed
    * embeddings, cosine ROUNDED to 4dp before the threshold compare
    * (so an engine's float-summation order cannot flip a boundary),
    * token-less sentences (no embedding) always open a chunk.
    * Sentence ids are `(doc_id, pos)` STRUCT keys — collision-proof
    * by construction for any doc_id/sentence count (the embedder
    * treats its id column opaquely, so nothing needs a packed long).
    *
    * Scale shape: sentences explode once; the embedder reduces them
    * to slim (sid, bucket, v) rows; one lag window per doc over
    * (pos-ordered) slim rows decides boundaries; one groupBy
    * reassembles. Text shuffles once, on the uniform doc key.
    */
  def semanticChunks(docs: DataFrame, dim: Int = 64,
                     minSim: Double = 0.3, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim >= 2 && minSim > -1.0 && minSim < 1.0,
      "dim >= 2, minSim in (-1, 1)")
    val sent = docs
      .select(col(idCol),
        posexplode(Sentences.sentences(col(textCol))).as(Seq("__pos", "__s")))
      .withColumn("__sid",
        struct(col(idCol).cast("long").as("d"), col("__pos").as("p")))
    val emb = VectorFuncs.hashedEmbedding(
        sent.select(col("__sid").as("doc_id"), col("__s").as("text")),
        dim)
      .select(col("doc_id").as("__sid"), col("embedding"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val wc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sent
      .join(emb, Seq("__sid"), "left")
      .withColumn("__prev", lag(col("embedding"), 1).over(w))
      .withColumn("__sim",
        when(col("__prev").isNotNull && col("embedding").isNotNull,
          round(VectorFuncs.cosine(col("__prev"), col("embedding")), 4)))
      .withColumn("__cut",
        when(col("__sim").isNull || col("__sim") < minSim, 1L)
          .otherwise(0L))
      .withColumn("chunk_idx",
        (sum(col("__cut")).over(wc) - 1L).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__pos"), col("__s")))),
          x => x.getField("__s"))).as("chunk_text"),
        count(lit(1)).cast("int").as("n_sentences"))
  }
}
