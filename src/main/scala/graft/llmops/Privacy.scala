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
}
