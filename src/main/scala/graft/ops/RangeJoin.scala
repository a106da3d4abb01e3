package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band/range join by time proximity, without an inequality join:
  * rows bucket to `floor(time / gap)`; the probe side additionally
  * probes the next bucket, so every pair within `gap` shares an
  * (equi-joinable) bucket. The O(N²)-prone theta join becomes an
  * equi-join whose fan-out is bounded by rows-per-bucket — the same
  * candidate-generation-then-verify shape as the LSH operators.
  */
object RangeJoin {

  /** Self-pairs (id_a < id_b) within the same key group whose `timeCol`
    * values differ by at most `maxGapMicros`. Output columns: keys ++
    * (id_a, id_b, gap_us).
    */
  def timeProximityPairs(df: DataFrame, keys: Seq[String], idCol: String,
                         timeCol: String, maxGapMicros: Long): DataFrame = {
    val base = df.select(
      keys.map(col) ++ Seq(
        col(idCol).as("__id"),
        graft.expr.TimeFuncs.tsMicros(col(timeCol)).as("__us")): _*)
      .withColumn("__bucket", floor(col("__us") / maxGapMicros))
    // probe own bucket and the next: any pair within gap lands together
    val probe = base.withColumn("__bucket",
      explode(array(col("__bucket"), col("__bucket") + 1)))
    probe.select(
      keys.map(col) ++ Seq(col("__bucket"),
        col("__id").as("__id_l"), col("__us").as("__us_l")): _*)
      .join(base.select(
        keys.map(col) ++ Seq(col("__bucket"),
          col("__id").as("__id_r"), col("__us").as("__us_r")): _*),
        keys :+ "__bucket")
      .filter(col("__id_l") =!= col("__id_r"))
      .filter(abs(col("__us_l") - col("__us_r")) <= maxGapMicros)
      .select(
        keys.map(col) ++ Seq(
          least(col("__id_l"), col("__id_r")).as("id_a"),
          greatest(col("__id_l"), col("__id_r")).as("id_b"),
          abs(col("__us_l") - col("__us_r")).as("gap_us")): _*)
      .distinct()
  }
}
