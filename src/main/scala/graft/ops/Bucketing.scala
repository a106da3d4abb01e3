package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling a fact table once into hash
  * buckets on its join key makes every subsequent equi-join on that key
  * shuffle-free (Spark reads matching buckets pairwise). At 100 TB this
  * converts the dominant repeated join cost into a one-time write cost.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables previously bucketed on `key` with the same bucket
    * count — plans as SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
