package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Identifier-level privacy operators — the structured-data
  * complement of the text-side PII scrubbing (X14, which redacts
  * emails/phones/IPs INSIDE document text): event logs and metadata
  * tables carry identifiers in COLUMNS, and a training-data pipeline
  * that exports them needs (a) identifiers that cannot be reversed
  * but still join, and (b) a measurement of how identifying the
  * "harmless" columns are in combination.
  */
object Privacy {

  /** Keyed pseudonymization (X194): replace an identifier column with
    * `md5(key || ':' || value)` — deterministic under a fixed key, so
    * the SAME pseudonym appears for the same id across every table
    * and every run (joins, sessionization, and per-user aggregates
    * all still work on the pseudonym), while reversal requires the
    * key (rotate the key → unlinkable re-export; lose it → the
    * mapping is gone, which is the point). Cardinality is preserved
    * (md5 collisions at corpus id-cardinalities are negligible and an
    * audit is one distinct-count compare — the spec pins it).
    *
    * Per-row codegen'd hash projection — no shuffle, no state, and
    * the pseudonym pushes through partitioning exactly like the
    * original key did (same distinct structure, new byte values).
    *
    * NOT cryptographic HMAC (md5 concat is fine against id-space
    * enumeration only when the key has entropy; a production export
    * with adversarial threat models should swap in a real MAC at this
    * one expression) — stated here because silently overclaiming
    * privacy strength is worse than a weak hash.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], key: String)
      : DataFrame = {
    require(cols.nonEmpty, "at least one column to pseudonymize")
    require(key.nonEmpty, "empty key defeats the purpose")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNull, lit(null))
          .otherwise(md5(concat(lit(key), lit(":"),
            col(c).cast("string")))))
    }
  }

  /** k-anonymity audit (X195; Sweeney 2002): how identifying are the
    * quasi-identifier columns in COMBINATION? A row is k-anonymous
    * when at least k−1 other rows share its full quasi-identifier
    * tuple; the audit reports the equivalence-class landscape — the
    * number a release decision actually reads ("4 % of rows sit in
    * classes smaller than 5"). One groupBy on the quasi columns
    * (slim projection), one bounded aggregate over class sizes.
    *
    * @return single row: (k, n_rows, n_classes, min_class_size,
    *         violating_classes, violating_rows, violating_row_rate) —
    *         violating = class size < k; rate 4dp over all rows
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int)
      : DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, "k must be >= 2 (k = 1 is vacuous)")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    classes.agg(
      lit(k).as("k"),
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__n")).as("min_class_size"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("violating_classes"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L))
        .as("violating_rows"))
      .withColumn("violating_row_rate",
        round(col("violating_rows") / col("n_rows").cast("double"), 4))
  }

  /** l-diversity audit (X208; Machanavajjhala et al. 2006) — the
    * attack k-anonymity misses: a class of 50 rows is 50-anonymous,
    * but if all 50 share ONE sensitive value, membership alone
    * discloses it (the homogeneity attack). Distinct l-diversity
    * requires every equivalence class to contain at least `l`
    * DISTINCT sensitive values; this audit reports the class
    * landscape the release decision reads, per the same contract as
    * [[kAnonymityAudit]] (which it complements — run both).
    *
    * Shape: one groupBy on (quasi..., sensitive) then one on
    * (quasi...) — both map-side-combinable slim-key aggregates; the
    * sensitive payload never travels beyond its hashed key. NULL
    * sensitive values count as a value (a class that is all-NULL
    * still discloses "unknown"): both levels use plain GROUP BY, where
    * NULL forms its own group — deliberately NOT count(DISTINCT),
    * whose null-dropping would report diversity the data lacks.
    *
    * @return single row: (l, n_rows, n_classes, min_distinct_sensitive,
    *         violating_classes, violating_rows, violating_row_rate) —
    *         violating = class with < l distinct sensitive values
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    require(l >= 2, "l must be >= 2 (l = 1 is vacuous)")
    val qs = quasiCols.map(col)
    val perValue = df
      .groupBy((qs :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val classes = perValue.groupBy(qs: _*)
      .agg(sum(col("__n")).as("__rows"),
        count(lit(1)).as("__distinct"))
    classes.agg(
      lit(l).as("l"),
      sum(col("__rows")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__distinct")).as("min_distinct_sensitive"),
      sum(when(col("__distinct") < l, 1L).otherwise(0L))
        .as("violating_classes"),
      sum(when(col("__distinct") < l, col("__rows")).otherwise(0L))
        .as("violating_rows"))
      .withColumn("violating_row_rate",
        round(col("violating_rows") / col("n_rows").cast("double"), 4))
  }
}
