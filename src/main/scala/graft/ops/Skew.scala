package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for fact-fact equi-joins whose key distribution has
  * heavy hitters AQE's skew splitting can't fully absorb: classic key
  * salting. The left (skewed) side gets a random salt in [0, n); the
  * right side is replicated n times with every salt value; the join key
  * becomes (key, salt), spreading each hot key over n tasks.
  *
  * Replication multiplies the right side by n — use only when the right
  * side is much smaller than the hot key's row count (else prefer AQE
  * or a broadcast).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int = 16, joinType: String = "inner")
      : DataFrame = {
    require(saltBuckets > 0)
    // right side is replicated, so only join types that don't emit
    // unmatched right rows are sound
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not support $joinType (right side is replicated)")
    // deterministic salt: hash of the whole left row modulo buckets —
    // avoids rand() (non-reproducible across retries, breaks AQE reuse)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltBuckets)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
