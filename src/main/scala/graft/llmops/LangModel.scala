package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet quality
  * signal: train a cheap LM on a reference corpus, score every crawl
  * document by its per-token negative log-likelihood, filter or
  * bucket by the score (Wenzek et al. 2020). The model here is an
  * add-k-smoothed bigram LM, which is exactly a pair of count tables:
  *
  *   P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁) + k·V)
  *
  * so "training" is one aggregation per table (map-side partial on
  * the word/pair key — |vocab| rows shuffle, never the corpus) and
  * the model is relational data, not opaque weights: the q99 oracle
  * replays every score from the dumped tables.
  *
  * Scoring explodes each document to its bigram occurrences and joins
  * the count tables — Spark broadcasts them when small and falls back
  * to a shuffle join on the word keys when a 100 TB reference corpus
  * makes them big; either way rows are (id, w₁, w₂) slim. Unseen
  * bigrams/words degrade smoothly to the k/(k·V) floor rather than
  * −∞, the add-k point.
  *
  * Train on the corpus itself for self-perplexity (repetition/
  * boilerplate shows up LOW, gibberish HIGH), or pass tables trained
  * on a curated reference corpus for CCNet-style filtering — the
  * `uni`/`bi` parameters are that seam.
  */
object LangModel {

  /** Unigram counts (w, c) — every occurrence, not distinct. */
  def unigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextFuncs.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Bigram counts (w1, w2, c) over adjacent token pairs.
    *
    * `minCount` is the KenLM-style count-pruning threshold — the
    * scale valve for the one unbounded object in this family: the
    * pair table grows with the reference corpus's bigram TYPE count
    * (worst case \|vocab\|²) while everything else here is bounded.
    * Pruning at train time keeps the dumped model broadcastable;
    * pruned pairs simply take the unseen branch at scoring time
    * (add-k floor / KN continuation backoff), which is exactly how a
    * count-pruned KenLM behaves. The default 1 keeps every pair.
    */
  def bigramCounts(docs: DataFrame, textCol: Column,
                   minCount: Long = 1L): DataFrame = {
    val counts = docs.select(TextFuncs.tokens(textCol).as("__toks"))
      // sequence(1, x) with x < 1 runs DESCENDING — guard 1-token docs
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(
          element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    if (minCount <= 1L) counts else counts.filter(col("c") >= minCount)
  }

  /** Per-document average negative log-likelihood under the bigram LM
    * defined by (`uni`, `bi`, add-k): (id, n_bigrams, avg_nll).
    * Higher avg_nll = more surprising text. Documents with fewer than
    * 2 tokens have no bigrams and produce no row.
    */
  def nllScores(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                k: Double = 0.5,
                idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val v = uni.count().toDouble
    val pairs = docs
      .select(col(idCol), TextFuncs.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(
          element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
    pairs
      .join(bi.select(col("w1"), col("w2"), col("c").as("__cb")),
        Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c").as("__cu")),
        Seq("w1"), "left")
      .select(col(idCol),
        (-log((coalesce(col("__cb"), lit(0L)) + k) /
          (coalesce(col("__cu"), lit(0L)) + k * v))).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
  }

  // ---- interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman
  // 1999) — the smoothing family KenLM implements, i.e. what CCNet's
  // quality LM actually runs. Add-k (above) floors unseen mass
  // uniformly; KN redistributes it by CONTINUATION TYPE COUNT: a
  // word's probability after an unseen history is proportional to how
  // many distinct contexts it follows, not its raw frequency
  // ("francisco" is frequent but follows only "san", so it gets tiny
  // unseen-context mass). Every model quantity derives RELATIONALLY
  // from the bigram count table alone, so the model stays dumpable
  // data and the q112 oracle re-derives all of it in SQL:
  //
  //   c(w1·)    = Σ_w2 c(w1,w2)          history mass
  //   N1+(w1·)  = |{w2 : c(w1,w2)>0}|    history fan-out
  //   N1+(·w2)  = |{w1 : c(w1,w2)>0}|    continuation types
  //   N1+(··)   = |bi|                    total bigram types
  //   V         = |{w2}|                  continuation vocabulary
  //
  //   P_cont(w2)  = (N1+(·w2) + 1) / (N1+(··) + V + 1)
  //                 (add-one over TYPES keeps unseen words finite —
  //                  the KN analog of add-k's floor)
  //   P(w2|w1)    = max(c−D,0)/c(w1·) + D·N1+(w1·)/c(w1·)·P_cont(w2)
  //                 for seen histories; P_cont(w2) otherwise.

  /** History table (w1, ch, n1p): mass and fan-out per context. */
  def knHistory(bi: DataFrame): DataFrame =
    bi.groupBy("w1").agg(sum(col("c")).as("ch"),
      count(lit(1)).as("n1p")) // one row per (w1,w2) type → count = N1+

  /** Continuation table (w2, nc): distinct-context count per word. */
  def knContinuation(bi: DataFrame): DataFrame =
    bi.groupBy("w2").agg(count(lit(1)).as("nc"))

  /** Per-document average negative log-likelihood under interpolated
    * Kneser-Ney with absolute discount `d`: (id, n_bigrams, avg_nll),
    * same output contract as [[nllScores]]. The two driver-side
    * scalars (total bigram types, continuation vocabulary) are single
    * counts of |vocab|-bounded tables; scoring joins are slim
    * (id, w1, w2) rows against broadcast-or-shuffled model tables,
    * identical shape to the add-k path.
    */
  def knNllScores(docs: DataFrame, bi: DataFrame, d: Double = 0.75,
                  idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(d > 0 && d < 1, s"absolute discount d=$d must be in (0,1)")
    val hist = knHistory(bi)
    val cont = knContinuation(bi)
    val nTypes = bi.count().toDouble
    val v = cont.count().toDouble
    val pairs = docs
      .select(col(idCol), TextFuncs.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(
          element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))
    val pc = (coalesce(col("__nc"), lit(0L)) + 1.0) / (nTypes + v + 1.0)
    val p = when(col("__ch").isNull, pc).otherwise(
      greatest(coalesce(col("__cb"), lit(0L)) - d, lit(0.0)) / col("__ch") +
        (lit(d) * col("__n1p") / col("__ch")) * pc)
    pairs
      .join(bi.select(col("w1"), col("w2"), col("c").as("__cb")),
        Seq("w1", "w2"), "left")
      .join(hist.select(col("w1"), col("ch").as("__ch"),
        col("n1p").as("__n1p")), Seq("w1"), "left")
      .join(cont.select(col("w2"), col("nc").as("__nc")), Seq("w2"), "left")
      .select(col(idCol), (-log(p)).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
  }
}
