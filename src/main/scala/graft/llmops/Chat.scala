package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Chat-transcript shape audit (X228) — the data-quality gate for
  * SFT/RLHF conversation corpora, which arrive as JSON turn arrays
  * (`[{"role": "...", "content": "..."}, …]`) and break training in
  * shape-level ways no text heuristic sees: non-alternating roles
  * (two user turns in a row after a bad merge), conversations that
  * open with the assistant, empty turns from extraction bugs, and
  * grossly unbalanced user/assistant mass.
  *
  * Everything is builtin composition — `from_json` into a typed turn
  * array, then higher-order functions over it — so the audit is one
  * narrow projection per conversation: no explode, no shuffle, and
  * the parse cost is paid once per row. Malformed JSON parses to null
  * and is reported as such (`parsed = false`), never a task failure.
  */
object Chat {

  /** Schema of one parsed turn array. */
  val turnsSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Per-conversation shape audit over a JSON transcript column:
    * (idCol, parsed, n_turns, starts_with_user, alternates, n_empty,
    * user_chars, assistant_chars, other_chars, n_unknown_role).
    * `alternates` = no two consecutive turns share a role (null-SAFE:
    * two consecutive missing/null roles count as the same role — a
    * role-vocabulary break must not hide behind null comparison
    * semantics; vacuously true for 0/1-turn conversations, including
    * a valid empty `[]` transcript, which audits as zero turns, not a
    * task failure). `n_empty` counts null/empty contents; char masses
    * count content length per role, with `other_chars` carrying every
    * turn whose role is NOT user/assistant (system, tool, corrupted,
    * null) and `n_unknown_role` counting those turns — so a role
    * break carries mass instead of silently vanishing from the
    * user/assistant columns. Unparseable JSON → parsed=false, rest
    * null.
    */
  def transcriptAudit(df: DataFrame, idCol: String = "convo_id",
                      jsonCol: String = "convo_json"): DataFrame = {
    val arr = from_json(col(jsonCol), turnsSchema)
    def known(t: Column): Column =
      coalesce(t.getField("role").isin("user", "assistant"), lit(false))
    def charsOf(a: Column, pred: Column => Column): Column =
      aggregate(filter(a, pred), lit(0L), (acc, t) =>
        acc + coalesce(length(t.getField("content")).cast("long"),
          lit(0L)))
    df.select(col(idCol), arr.as("__t"))
      .select(col(idCol),
        col("__t").isNotNull.as("parsed"),
        size(col("__t")).as("n_turns"),
        // get() is 0-based and OOB-null-safe — element_at(·, 1) on a
        // valid empty transcript throws under ANSI mode
        (get(col("__t"), lit(0)).getField("role") === "user")
          .as("starts_with_user"),
        // 0/1-turn conversations alternate vacuously; the guard also
        // keeps sequence() ascending (sequence(2, 1) would descend)
        when(size(col("__t")) < 2, lit(true))
          .otherwise(!exists(sequence(lit(2), size(col("__t"))),
            i => element_at(col("__t"), i).getField("role") <=>
              element_at(col("__t"), i - 1).getField("role")))
          .as("alternates"),
        size(filter(col("__t"), t => t.getField("content").isNull ||
          t.getField("content") === "")).as("n_empty"),
        charsOf(col("__t"), t => t.getField("role") === "user")
          .as("user_chars"),
        charsOf(col("__t"), t => t.getField("role") === "assistant")
          .as("assistant_chars"),
        charsOf(col("__t"), t => !known(t)).as("other_chars"),
        size(filter(col("__t"), t => !known(t))).as("n_unknown_role"))
      .withColumn("n_turns",
        when(col("parsed"), col("n_turns")))
      .withColumn("starts_with_user",
        when(col("parsed"), coalesce(col("starts_with_user"),
          lit(false))))
      .withColumn("alternates", when(col("parsed"), col("alternates")))
      .withColumn("n_empty", when(col("parsed"), col("n_empty")))
      .withColumn("user_chars", when(col("parsed"), col("user_chars")))
      .withColumn("assistant_chars",
        when(col("parsed"), col("assistant_chars")))
      .withColumn("other_chars", when(col("parsed"), col("other_chars")))
      .withColumn("n_unknown_role",
        when(col("parsed"), col("n_unknown_role")))
  }
}
