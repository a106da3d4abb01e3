package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-quality audits for annotated training data (X226).
  *
  * Cohen's kappa (Cohen 1960) is the standard chance-corrected
  * inter-annotator agreement for two raters over a nominal label set:
  * κ = (p_o − p_e) / (1 − p_e), where p_o is observed agreement and
  * p_e = Σ_k p_a(k)·p_b(k) the agreement two independent raters with
  * the same marginals would reach by chance. Raw percent agreement
  * overstates quality whenever the label distribution is skewed — the
  * exact situation of real annotation queues (mostly-"ok" moderation
  * labels), which is why dataset cards report κ.
  *
  * Scale shape: one ungrouped aggregate over the item stream (count +
  * observed agreement) plus two label-keyed aggregates the size of
  * the LABEL SPACE, joined on the label key — items shuffle only as
  * slim (label, n) rows, and the final arithmetic runs on one row.
  * Reference behavior: rows where either rater's label is NULL are
  * excluded (an unlabeled item measures coverage, not agreement);
  * κ is null when p_e = 1 (a single shared label — chance explains
  * everything, the statistic is undefined).
  */
object Labeling {

  /** @return one row: (n_items, po, pe, kappa) — 4dp, kappa null
    *         when pe = 1
    */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String)
      : DataFrame = {
    val labeled = df
      .where(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).as("__a"), col(raterBCol).as("__b"))
    val base = labeled.agg(
      count(lit(1)).as("n_items"),
      coalesce(avg(when(col("__a") === col("__b"), 1.0).otherwise(0.0)),
        lit(0.0)).as("__po"))
    val pe = labeled.groupBy(col("__a").as("__lbl"))
      .agg(count(lit(1)).as("__na"))
      .join(labeled.groupBy(col("__b").as("__lbl"))
        .agg(count(lit(1)).as("__nb")), Seq("__lbl"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__ab"))
    base.crossJoin(pe)
      .select(col("n_items"),
        round(col("__po"), 4).as("po"),
        round(col("__ab") / (col("n_items") * col("n_items"))
          .cast("double"), 4).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 4)))
      .select(col("n_items"), col("po"), col("pe"), col("kappa"))
  }
}
