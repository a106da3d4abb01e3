package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-eval metrics beyond the ROUGE family (X242): BLEU for
  * precision-oriented n-gram fidelity with a brevity penalty
  * (Papineni 2002) and chrF for character-level robustness to
  * tokenization and morphology (Popović 2015) — the two receipts MT
  * and instruction-tuning evals report next to ROUGE.
  *
  * Shared scale shape with [[Rouge.rougeN]]: both reduce each side to
  * slim (id, n, gram, count) rows and meet in ONE (id, n, gram)
  * equi-join — nothing cross-pair, cost tracks text length. All the
  * order-sensitive arithmetic (geometric mean, brevity penalty,
  * F-beta) runs on per-pair ROUNDED 4dp components so the oracle
  * replays the exact chain, and the geometric mean uses nested
  * `sqrt` (IEEE-exact, engine-independent) instead of exp/ln.
  */
object GenEval {

  /** (id, n, gram, count) rows for n = 1..maxN in one pass — the
    * n-gram bag of each side with the gram LENGTH in the key.
    */
  private def gramCountsMulti(df: DataFrame, idCol: String,
                              textCol: String, maxN: Int,
                              out: String): DataFrame = {
    val toks = filter(coalesce(TextFuncs.tokens(col(textCol)),
      array().cast("array<string>")), t => t =!= "")
    // guard: sequence(1, 0) DESCENDS in Spark — a side shorter than
    // n contributes no n-grams, not an i=0 slice error
    val grams = flatten(transform(sequence(lit(1), lit(maxN)), n =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => struct(n.as("n"),
            concat_ws(" ", slice(toks, i, n)).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))))
    df.select(col(idCol).as("__id"), explode(grams).as("__gr"))
      .select(col("__id"), col("__gr.n").as("__n"),
        col("__gr.g").as("__g"))
      .groupBy(col("__id"), col("__n"), col("__g"))
      .agg(count(lit(1)).as(out))
  }

  /** Per-pair BLEU-maxN (unsmoothed, the reference definition):
    * clipped modified n-gram precisions p_1..p_maxN, geometric mean
    * via nested square roots, brevity penalty exp(1 − r/c) when the
    * candidate is shorter than the reference. Any zero precision
    * zeroes BLEU (no smoothing — a candidate with no shared 4-gram
    * scores 0 by the strict definition; use [[Rouge.rougeN]] or
    * [[chrF]] when graded credit is wanted). An empty candidate
    * scores 0 with bp = 0.0 by stated convention; every input pair
    * keeps its row. `maxN` must be 4 (the standard) — fixed so the
    * per-n precisions are explicit output columns.
    *
    * @return (idCol, n_cand, n_ref, p1, p2, p3, p4, bp, bleu) —
    *         counts are token counts, metrics 4dp; bleu is computed
    *         from the ROUNDED components (oracle-mirrored chain)
    */
  def bleu(pairs: DataFrame, idCol: String = "doc_id",
           candCol: String = "candidate",
           refCol: String = "reference"): DataFrame = {
    val maxN = 4
    val cg = gramCountsMulti(pairs, idCol, candCol, maxN, "__nc")
    val rg = gramCountsMulti(pairs, idCol, refCol, maxN, "__nr")
    val perN = cg.join(rg, Seq("__id", "__n", "__g"), "full_outer")
      .groupBy(col("__id"), col("__n"))
      .agg(coalesce(sum(least(coalesce(col("__nc"), lit(0L)),
          coalesce(col("__nr"), lit(0L)))), lit(0L)).as("__ov"),
        coalesce(sum(col("__nc")), lit(0L)).as("__cn"),
        coalesce(sum(col("__nr")), lit(0L)).as("__rn"))
    def pn(n: Int): Column = round(coalesce(max(when(col("__n") === n,
      when(col("__cn") > 0,
        col("__ov").cast("double") / col("__cn")).otherwise(0.0))),
      lit(0.0)), 4).as(s"p$n")
    val wide = perN.groupBy(col("__id"))
      .agg(coalesce(max(when(col("__n") === 1, col("__cn"))), lit(0L))
          .as("n_cand"),
        coalesce(max(when(col("__n") === 1, col("__rn"))), lit(0L))
          .as("n_ref"),
        pn(1), pn(2), pn(3), pn(4))
      .withColumn("bp", round(
        when(col("n_cand") === 0, 0.0)
          .when(col("n_cand") >= col("n_ref"), 1.0)
          .otherwise(exp(lit(1.0) -
            col("n_ref").cast("double") / col("n_cand"))), 4))
      .withColumn("bleu", round(col("bp") *
        sqrt(sqrt(col("p1") * col("p2") * col("p3") * col("p4"))), 4))
    pairs.select(col(idCol))
      .join(wide, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("p1"), lit(0.0)).as("p1"),
        coalesce(col("p2"), lit(0.0)).as("p2"),
        coalesce(col("p3"), lit(0.0)).as("p3"),
        coalesce(col("p4"), lit(0.0)).as("p4"),
        coalesce(col("bp"), lit(0.0)).as("bp"),
        coalesce(col("bleu"), lit(0.0)).as("bleu"))
  }

  /** Per-pair chrF2 (Popović 2015): character n-gram F-score with
    * β = 2 (recall-weighted), n = 1..6 over whitespace-stripped,
    * case-folded text. chrP/chrR are the MACRO-averages over n of the
    * per-n clipped precision/recall (a side too short for an n
    * contributes 0 for that n — the sacrebleu convention), and
    * chrF2 = 5·P·R/(4P + R) from the ROUNDED averages. Character
    * grams make the metric robust to tokenization and morphology —
    * the standard companion when BLEU's strict token match is too
    * brittle. Both sides are capped at `maxChars` (the bounded-
    * comparison discipline of [[Rouge.rougeL]]).
    *
    * @return (idCol, chr_p, chr_r, chrf2) — 4dp; empty sides score 0
    */
  def chrF(pairs: DataFrame, idCol: String = "doc_id",
           candCol: String = "candidate", refCol: String = "reference",
           maxChars: Int = 5000): DataFrame = {
    require(maxChars >= 1, "maxChars must be >= 1")
    val maxN = 6
    def grams(textCol: String, out: String): DataFrame = {
      val s = substring(regexp_replace(
        lower(coalesce(col(textCol), lit(""))), "\\s+", ""),
        1, maxChars)
      // substring with Column start/len: use the SQL expression form
      pairs.select(col(idCol).as("__id"), s.as("__s"))
        .select(col("__id"), explode(expr(
          // CASE guard: sequence(1, 0) DESCENDS — a side shorter
          // than n has no n-grams (and substring(s, 0|-1, n) would
          // silently fabricate duplicates)
          s"""flatten(transform(sequence(1, $maxN), n ->
                CASE WHEN length(__s) >= n THEN
                  transform(sequence(1, length(__s) - n + 1),
                    i -> struct(n AS n, substring(__s, i, n) AS g))
                ELSE cast(array() AS array<struct<n:int,g:string>>)
                END))"""))
          .as("__gr"))
        .select(col("__id"), col("__gr.n").as("__n"),
          col("__gr.g").as("__g"))
        .groupBy(col("__id"), col("__n"), col("__g"))
        .agg(count(lit(1)).as(out))
    }
    val cg = grams(candCol, "__nc")
    val rg = grams(refCol, "__nr")
    val perN = cg.join(rg, Seq("__id", "__n", "__g"), "full_outer")
      .groupBy(col("__id"), col("__n"))
      .agg(coalesce(sum(least(coalesce(col("__nc"), lit(0L)),
          coalesce(col("__nr"), lit(0L)))), lit(0L)).as("__ov"),
        coalesce(sum(col("__nc")), lit(0L)).as("__cn"),
        coalesce(sum(col("__nr")), lit(0L)).as("__rn"))
    val wide = perN.groupBy(col("__id"))
      .agg(round(sum(when(col("__cn") > 0,
          col("__ov").cast("double") / col("__cn")).otherwise(0.0)) /
          maxN, 4).as("chr_p"),
        round(sum(when(col("__rn") > 0,
          col("__ov").cast("double") / col("__rn")).otherwise(0.0)) /
          maxN, 4).as("chr_r"))
      .withColumn("chrf2", round(
        when(lit(4.0) * col("chr_p") + col("chr_r") > 0,
          lit(5.0) * col("chr_p") * col("chr_r") /
            (lit(4.0) * col("chr_p") + col("chr_r"))).otherwise(0.0), 4))
    pairs.select(col(idCol))
      .join(wide, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("chr_p"), lit(0.0)).as("chr_p"),
        coalesce(col("chr_r"), lit(0.0)).as("chr_r"),
        coalesce(col("chrf2"), lit(0.0)).as("chrf2"))
  }
}
