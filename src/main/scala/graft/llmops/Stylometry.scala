package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Burrows' Delta stylometric distance (X229; Burrows 2002, the
  * standard authorship-attribution measure): how far apart two groups
  * of text are in FUNCTION-WORD usage — the high-frequency vocabulary
  * an author (or a generator) uses unconsciously, robust to topic.
  * For training corpora it answers "do these sources/models write in
  * the same register" — duplicated style across supposedly diverse
  * sources, or a synthetic-data generator whose outputs cluster away
  * from human text, both show up as a Delta structure no content
  * heuristic sees.
  *
  * Exactly the classical recipe: take the corpus-wide top-k terms
  * ((count desc, term) — with no stoplist these ARE the function
  * words), per-group relative frequency f(g,w) = n(g,w)/tokens(g),
  * z-score each term across groups with the POPULATION standard
  * deviation (stated — Burrows used the sample sd; the population
  * choice keeps the two-group case defined), and
  * Delta(a,b) = mean_w |z(a,w) − z(b,w)|. Zero-variance terms (same
  * relative frequency in every group) contribute 0 by convention.
  *
  * Scale shape: one tokenize scan reduces to slim (group, term, n)
  * rows; the vocabulary head is a TakeOrdered of k terms; z-scores
  * and pairwise distances run over the |groups|·k dense grid (both
  * construction-bounded — missing (group, term) cells are genuine
  * zeros and are materialized as such, since absence of a common
  * word IS style evidence).
  */
object Stylometry {

  /** @return (group_a, group_b, delta) for group_a < group_b, 4dp. */
  def burrowsDelta(docs: DataFrame, k: Int = 50,
                   groupCol: String = "source",
                   textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs
      .where(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFuncs.tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val gw = toks.groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__n"))
    val vocab = gw.groupBy(col("__w"))
      .agg(sum(col("__n")).as("__tot"))
      .orderBy(col("__tot").desc, col("__w"))
      .limit(k)
      .select(col("__w"))
    val gTotals = gw.groupBy(col("__g"))
      .agg(sum(col("__n")).as("__gt"))
    // dense grid: every (group, head-term) cell, zeros materialized
    val grid = gTotals.crossJoin(broadcast(vocab))
      .join(gw, Seq("__g", "__w"), "left")
      .select(col("__g"), col("__w"),
        (coalesce(col("__n"), lit(0L)) / col("__gt").cast("double"))
          .as("__f"))
    val stats = grid.groupBy(col("__w"))
      .agg(avg(col("__f")).as("__mu"),
        stddev_pop(col("__f")).as("__sd"))
    // localCheckpoint: the pairwise self-join below consumes z TWICE,
    // and z's lineage holds the whole tokenize scan — without the cut
    // the corpus is tokenized once per join branch (PlanShapeSpec
    // caught 4 copies of the grid subtree). z is |groups| × k rows.
    val z = grid.join(stats, Seq("__w"))
      .select(col("__g"), col("__w"),
        when(col("__sd") > 0, (col("__f") - col("__mu")) / col("__sd"))
          .otherwise(lit(0.0)).as("__z"))
      .localCheckpoint()
    val a = z.select(col("__g").as("group_a"), col("__w"),
      col("__z").as("__za"))
    val b = z.select(col("__g").as("group_b"), col("__w"),
      col("__z").as("__zb"))
    a.join(b, Seq("__w"))
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(round(avg(abs(col("__za") - col("__zb"))), 4).as("delta"))
  }
}
