package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Spark has no native as-of join; rather than a custom SparkPlan this
  * uses the union + carry-forward-window composition, which is the
  * scale-correct shape: ONE shuffle on (keys), no join at all, state
  * bounded by the window's running `last(_, ignoreNulls = true)`.
  * (A sort-merge band join would shuffle both sides AND sort; the
  * union sorts once over the combined stream.)
  */
object AsOf {

  /** @param left      rows to enrich; must contain `keys` and `leftTime`
    * @param right     lookup stream; must contain `keys`, `rightTime`,
    *                  and `valueCols`
    * @param valueCols right columns carried onto matching left rows
    *                  (null when no right row precedes the left row)
    * @param forward   false (default): most recent right row with
    *                  `rightTime <= leftTime`; true: nearest FUTURE
    *                  right row (`rightTime >= leftTime`) — the same
    *                  one-shuffle union composition with the carry
    *                  window running over descending time
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq

    // tag and align schemas: right rows sort BEFORE left rows at equal
    // timestamps so a right row at exactly leftTime matches (<=)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__t"), col("__side")) ++
        keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__t"), col("__side")) ++
        keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    // right rows sort before left at equal __t in BOTH directions, so
    // an exactly-coincident right row matches the <= / >= bound
    val order =
      if (forward) Seq(col("__t").desc, col("__side"))
      else Seq(col("__t"), col("__side"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select((keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) :+
        col("__side")) ++
        valueCols.map(c =>
          last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
