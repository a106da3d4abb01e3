package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins CDC apply (X172) — the lakehouse MERGE shape as one
  * relational operator: fold a change batch (upserts + deletes, each
  * versioned by a timestamp) into a snapshot, producing the next
  * snapshot. [[SnapshotDiff]] answers "what changed between two
  * snapshots"; this PRODUCES the new snapshot from a change log —
  * the other half of the release loop, and the batch-side primitive
  * behind the X113/X142 index-maintenance tier applied to arbitrary
  * tables.
  *
  * Resolution: per key, the row with the greatest (version, origin,
  * row) wins — `origin` puts changes above the snapshot at EQUAL
  * version (re-applying a batch that was already folded is a no-op:
  * idempotent), and the full row as the last tiebreak makes even a
  * pathological duplicate-version batch resolve deterministically
  * instead of nondeterministically-by-partition-order. A winning
  * delete removes the key.
  *
  * Scale shape: one union of the two inputs and one max_by
  * aggregation on the key — map-side combinable, no window, no sort;
  * exactly the shuffle a hash groupBy needs and nothing more.
  */
object Merge {

  /** @param snapshot current table; must contain `keyCols` + `tsCol`
    * @param changes  change rows: same schema as snapshot plus
    *                 `opCol` ∈ {"u", "d"}
    * @return the next snapshot, same schema as `snapshot`
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], tsCol: String,
                   opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val cols = snapshot.columns.toSeq
    require(!cols.contains(opCol),
      s"snapshot must not already carry the op column '$opCol'")
    val payload = cols.filterNot(keyCols.contains)
    val s = snapshot.select(
      (cols.map(col) :+ lit("u").as(opCol) :+ lit(0).as("__origin")): _*)
    // loud-failure convention: an unrecognized op must not silently
    // become an upsert, and a NULL op must not act as a delete (the
    // final `=!= 'd'` filter evaluates NULL and drops the winner) —
    // reject the batch row-side instead of corrupting the snapshot
    val checkedOp = when(col(opCol).isin("u", "d"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyChanges: op column '$opCol' must be 'u' or 'd', got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val c = changes.select(
      (cols.map(col) :+ checkedOp.as(opCol) :+ lit(1).as("__origin")): _*)
    val all = s.unionByName(c)
    val valueStruct = struct(
      (payload.map(col) :+ col(opCol).as("__op")): _*)
    val orderStruct = struct(
      col(tsCol).as("__v"), col("__origin"), valueStruct.as("__w"))
    val winners = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(valueStruct, orderStruct).as("__win"))
    winners
      .filter(col("__win.__op") =!= "d")
      .select((keyCols.map(col) ++
        payload.map(p => col(s"__win.$p").as(p))): _*)
      .select(cols.map(col): _*)
  }
}
