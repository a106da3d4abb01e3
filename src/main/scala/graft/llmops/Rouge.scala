package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROUGE-N overlap metrics (Lin 2004) for (candidate, reference) text
  * pairs (X227) — the standard n-gram eval for summarization /
  * generation pipelines, and the receipt a distillation or
  * synthetic-data run reports next to its outputs. BAG semantics with
  * clipping, exactly as defined: the overlap credited for gram g is
  * min(count_candidate(g), count_reference(g)), so repeating a
  * reference gram five times in the candidate earns it once.
  *
  * Scale shape: one tokenize per side, grams reduce to slim
  * (id, gram, n) rows, one equi-join on (id, gram) — per-pair cost
  * tracks text length, nothing cross-pair ever joins. Convention:
  * a side with fewer than n tokens has zero n-grams, and a zero
  * denominator scores 0.0 (the reference implementation's behavior),
  * not null — an empty candidate IS a failed generation.
  */
object Rouge {

  /** n-grams with BAG multiplicity as (id, gram, n) counts; a text
    * with fewer than `n` tokens contributes no rows.
    */
  private def gramCounts(df: DataFrame, idCol: String, textCol: String,
                         n: Int, out: String): DataFrame = {
    val toks = TextFuncs.tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol).as("__id"), explode(grams).as("__g"))
      .groupBy(col("__id"), col("__g"))
      .agg(count(lit(1)).as(out))
  }

  /** Per-pair ROUGE-N: (idCol, n_cand, n_ref, overlap, precision,
    * recall, f1) — counts are n-gram totals, metrics 4dp; every input
    * pair gets a row (including zero-gram sides, scored 0.0).
    */
  def rougeN(pairs: DataFrame, n: Int = 2, idCol: String = "doc_id",
             candCol: String = "candidate", refCol: String = "reference")
      : DataFrame = {
    require(n >= 1, "n must be >= 1")
    val cg = gramCounts(pairs, idCol, candCol, n, "__nc")
    val rg = gramCounts(pairs, idCol, refCol, n, "__nr")
    val joined = cg.join(rg, Seq("__id", "__g"), "full_outer")
      .groupBy(col("__id"))
      .agg(coalesce(sum(col("__nc")), lit(0L)).as("n_cand"),
        coalesce(sum(col("__nr")), lit(0L)).as("n_ref"),
        coalesce(sum(least(coalesce(col("__nc"), lit(0L)),
          coalesce(col("__nr"), lit(0L)))), lit(0L)).as("overlap"))
    def safe(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den).otherwise(0.0), 4)
    pairs.select(col(idCol))
      .join(joined, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("precision", safe(col("overlap"), col("n_cand")))
      .withColumn("recall", safe(col("overlap"), col("n_ref")))
      .withColumn("f1", round(when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(0.0), 4))
  }

  /** Per-pair ROUGE-L (X234; Lin 2004 §3.1): longest common
    * SUBSEQUENCE coverage — the ORDER-AWARE companion every
    * summarization/distillation eval reports next to ROUGE-N. A
    * shuffled candidate keeps its bigram bag mostly intact; its LCS
    * collapses, which is the point. Whole-text token LCS (the
    * summary-level variant; not per-sentence union), F1 flavor like
    * [[rougeN]] — P = LCS/|cand|, R = LCS/|ref|, zero denominators
    * score 0.0 and null texts count as empty.
    *
    * Scale shape: the [[graft.expr.SeqSim.LcsLength]] codegen kernel
    * runs inside the row projection — a narrow map, NO shuffle or
    * join at all (cheaper in shape than ROUGE-N's gram join). The DP
    * is O(m·n) per pair, so both sides are capped at `maxTokens`
    * (coverage beyond the cap is invisible by contract — the same
    * bounded-comparison discipline as Recrawl.contentDrift).
    *
    * @return (idCol, n_cand, n_ref, lcs, precision, recall, f1) —
    *         counts are post-cap token counts, metrics 4dp
    */
  def rougeL(pairs: DataFrame, idCol: String = "doc_id",
             candCol: String = "candidate", refCol: String = "reference",
             maxTokens: Int = 2000): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    def toks(c: String) = slice(
      filter(coalesce(TextFuncs.tokens(col(c)),
        array().cast("array<string>")), t => t =!= ""),
      1, maxTokens)
    def safe(num: org.apache.spark.sql.Column,
             den: org.apache.spark.sql.Column) =
      round(when(den > 0, num.cast("double") / den).otherwise(0.0), 4)
    pairs
      .select(col(idCol), toks(candCol).as("__ct"), toks(refCol).as("__rt"))
      .select(col(idCol),
        size(col("__ct")).cast("long").as("n_cand"),
        size(col("__rt")).cast("long").as("n_ref"),
        graft.expr.SeqSim.lcs_length(col("__ct"), col("__rt"))
          .cast("long").as("lcs"))
      .withColumn("precision", safe(col("lcs"), col("n_cand")))
      .withColumn("recall", safe(col("lcs"), col("n_ref")))
      .withColumn("f1", round(when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(0.0), 4))
  }
}
