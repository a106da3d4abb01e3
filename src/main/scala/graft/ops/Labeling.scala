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

  /** Krippendorff's alpha, nominal data (X233; Krippendorff 2004) —
    * the agreement statistic for the cases Cohen's kappa cannot
    * score: ANY number of raters, MISSING labels (a unit rated by
    * whoever was available contributes whatever pairs it has), and
    * no fixed rater identity — the shape real annotation queues
    * produce. Input is long format: one row per (item, label)
    * assignment; rater identity is irrelevant for nominal alpha.
    *
    * Exactly the coincidence-matrix formulation: with n_uc = labels
    * of category c on unit u, m_u = Σ_c n_uc, over units with
    * m_u ≥ 2 (single-label units are unpairable and dropped),
    * n = Σ m_u:
    *   D_o = (1/n) Σ_u Σ_c n_uc·(m_u − n_uc)/(m_u − 1)
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n − 1))
    *   α   = 1 − D_o/D_e   (null when D_e = 0 — one shared category,
    *                        or n < 2 — nothing to pair)
    * Perfect agreement → 1; chance-level → 0; systematic
    * disagreement < 0.
    *
    * Scale shape: one (item, label) count aggregate, one item-keyed
    * roll-up, label-space and single-row aggregates after — items
    * shuffle as slim count rows, the arithmetic runs on one row.
    * Alpha is computed from the UNROUNDED D_o/D_e (the displayed
    * d_o/d_e are 4dp); the oracle mirrors that order.
    *
    * @return one row: (n_pairable, d_o, d_e, alpha) — 4dp
    */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        labelCol: String): DataFrame = {
    val labeled = df
      .where(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .select(col(itemCol).as("__u"), col(labelCol).as("__c"))
    val nuc = labeled.groupBy(col("__u"), col("__c"))
      .agg(count(lit(1)).as("__nuc"))
    val mu = nuc.groupBy(col("__u")).agg(sum(col("__nuc")).as("__mu"))
    val units = nuc.join(mu, Seq("__u")).where(col("__mu") >= 2)
    val doRow = units.agg(
      coalesce(sum(col("__nuc") * (col("__mu") - col("__nuc")) /
        (col("__mu") - 1).cast("double")), lit(0.0)).as("__donum"),
      coalesce(sum(col("__nuc")), lit(0L)).as("__n"))
    val deRow = units.groupBy(col("__c"))
      .agg(sum(col("__nuc")).as("__nc"))
      .agg(coalesce(sum(col("__nc") * col("__nc")), lit(0L)).as("__nc2"))
    doRow.crossJoin(deRow)
      .select(col("__n").as("n_pairable"),
        when(col("__n") >= 2, col("__donum") / col("__n")).as("__do"),
        // Σ n_c(n − n_c) = n² − Σ n_c²
        when(col("__n") >= 2,
          (col("__n") * col("__n") - col("__nc2")).cast("double") /
            (col("__n") * (col("__n") - 1))).as("__de"))
      .select(col("n_pairable"),
        round(col("__do"), 4).as("d_o"),
        round(col("__de"), 4).as("d_e"),
        when(col("__de") > 0,
          round(lit(1.0) - col("__do") / col("__de"), 4)).as("alpha"))
  }
}
