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

  /** Interval-overlap equi-join: pairs (one row per overlapping
    * left × right interval pair, same key group) under HALF-OPEN
    * `[start, end)` semantics — `a` overlaps `b` iff
    * `a.start < b.end && b.start < a.end`; touching endpoints don't
    * count and zero-length intervals overlap nothing.
    *
    * Scale shape: the inequality theta-join (O(|L|·|R|) and
    * NestedLoopJoin-prone in any engine) becomes an equi-join on
    * (keys, time bucket): each interval explodes to the
    * `len/bucketMicros + 1` buckets it spans, overlapping pairs are
    * guaranteed to co-occur in the bucket containing
    * `max(start_a, start_b)` (that instant lies inside BOTH
    * intervals), and emitting a pair ONLY from that canonical bucket
    * dedups without a `distinct()` shuffle. Pick `bucketMicros` near
    * the median interval length: per-interval fan-out stays O(1) and
    * rows-per-bucket bounds the join's candidate fan-out, the same
    * propose-then-verify shape as [[timeProximityPairs]] and the LSH
    * tier. Output: keys ++ (id_a, id_b, overlap_us).
    */
  def intervalOverlapPairs(left: DataFrame, right: DataFrame,
                           keys: Seq[String], idCol: String,
                           startCol: String, endCol: String,
                           bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    def prep(df: DataFrame, side: String): DataFrame =
      df.select(
        keys.map(col) ++ Seq(
          col(idCol).as(s"__id_$side"),
          graft.expr.TimeFuncs.tsMicros(col(startCol)).as(s"__s_$side"),
          graft.expr.TimeFuncs.tsMicros(col(endCol)).as(s"__e_$side")): _*)
        .filter(col(s"__e_$side") > col(s"__s_$side")) // empty: no overlap
        .withColumn("__bucket",
          explode(sequence(
            floor(col(s"__s_$side") / bucketMicros),
            floor((col(s"__e_$side") - 1) / bucketMicros))))
    prep(left, "a")
      .join(prep(right, "b"), keys :+ "__bucket")
      .filter(col("__s_a") < col("__e_b") && col("__s_b") < col("__e_a"))
      .filter(col("__bucket") ===
        floor(greatest(col("__s_a"), col("__s_b")) / bucketMicros))
      .select(
        keys.map(col) ++ Seq(
          col("__id_a").as("id_a"),
          col("__id_b").as("id_b"),
          (least(col("__e_a"), col("__e_b")) -
            greatest(col("__s_a"), col("__s_b"))).as("overlap_us")): _*)
  }
}
