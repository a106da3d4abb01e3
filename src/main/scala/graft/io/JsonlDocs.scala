package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document corpus source/sink — the interchange format training
  * corpora actually ship in (one JSON object per line).
  *
  * Reading is schema-FIRST (never inferred: schema inference scans the
  * whole input once before the real read — a full extra pass at
  * 100 TB) and malformed lines are QUARANTINED, not dropped and not
  * fatal: PERMISSIVE mode keeps the raw line in a corrupt-record
  * column, so a bad shard surfaces as data you can count, sample, and
  * re-ingest instead of a silent row-count discrepancy. The split is
  * one narrow filter on the already-parsed stream — no second scan.
  */
object JsonlDocs {

  /** doc corpus schema (mirrors the synthetic `documents` table). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private val corruptCol = "_corrupt_record"

  /** Raw line + parsed struct + `_corrupt_record` (null ⇔ parsed).
    * Implemented as a text scan + `from_json` rather than the JSON
    * datasource: Spark forbids predicates on the datasource's corrupt
    * column without caching the whole parse first (an extra
    * materialization this formulation never needs — here the parse is
    * a narrow projection on one text scan). Pass a custom `docSchema`
    * for corpora with extra fields.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         docSchema: StructType = schema): DataFrame = {
    val full = docSchema.add(StructField(corruptCol, StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // JSONL allows blank lines
      .select(col("value").as("raw_line"),
        from_json(col("value"), full, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
  }

  /** (clean rows, quarantined raw lines): clean carries the parsed
    * columns; quarantine carries the raw line for re-ingest/forensics.
    */
  def readSplit(spark: SparkSession, path: String,
                docSchema: StructType = schema): (DataFrame, DataFrame) = {
    val all = readWithQuarantine(spark, path, docSchema)
    val isCorrupt = col(s"j.$corruptCol").isNotNull || col("j").isNull
    val clean = all.filter(!isCorrupt).select(col("j.*")).drop(corruptCol)
    val bad = all.filter(isCorrupt).select(col("raw_line"))
    (clean, bad)
  }

  /** Write a corpus as JSONL (one object per line, text-splittable —
    * the layout downstream loaders expect).
    */
  def write(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
