package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning — the manual form of
  * Spark's own runtime row-level filtering (`InjectRuntimeFilter`),
  * for when the dim side is too big to broadcast as a hash relation
  * but its KEY SET compresses into a few hundred KB of bloom bits.
  *
  * At 100 TB the win is where the rows die: the bloom test is a
  * codegen'd scalar filter evaluated at the fact scan, so non-matching
  * rows never enter the join shuffle. False positives (rate `fpp`)
  * only cost shuffle bytes, never correctness — the exact semi-join
  * behind the filter decides membership. The filter itself is
  * `BloomFilterMightContain` over a binary literal, the same Catalyst
  * expression Spark's runtime filter plants, so it participates in
  * whole-stage codegen and deserializes the sketch once per task.
  *
  * The bloom is built driver-side from the xxhash64'd keys (one
  * aggregation over the slim key column; `numBits/8` bytes of driver
  * memory, bounded and independent of dim row width) and shipped as a
  * literal — the DataFrame analog of the scalar-subquery bloom the
  * optimizer injects.
  */
object Bloom {

  /** Serialized bloom filter of `dimKey`'s xxhash64 values.
    * `BloomFilter.putLong` / `mightContainLong` are the symmetric
    * pair `BloomFilterAggregate`/`BloomFilterMightContain` use, so a
    * filter built over xxhash64(key) longs is directly consumable by
    * [[mightContain]].
    */
  def bloomBytesOf(dim: DataFrame, dimKey: Column,
                   expectedItems: Long, fpp: Double): Array[Byte] = {
    val keyed = dim.select(xxhash64(dimKey).as("__h"))
    // stat.bloomFilter NPEs on zero rows (null aggregation buffer);
    // an empty key set is a valid dim — its bloom rejects everything
    val bf =
      if (keyed.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(
          math.max(1L, expectedItems), fpp)
      else keyed.stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership test: might `key` be in the serialized
    * bloom? No false negatives; false positives at the build fpp.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact semi-join of `fact` against `dim`'s keys, with a bloom
    * pre-filter at the fact side so only probable matches reach the
    * join shuffle. Result is EXACTLY the plain semi-join (the bloom
    * admits no false negatives and the join removes false positives).
    *
    * xxhash64 is physical-type-sensitive (hash(5: int) ≠
    * hash(5L: long)), while the join itself coerces mixed key types —
    * so when the two sides' types differ, both are hashed through a
    * string cast to keep representations aligned. Integer-family
    * mixes (int vs long) align exactly; fractional-vs-integral mixes
    * ("5.0" vs "5") do not — pre-cast such keys to a common type
    * before calling.
    */
  def prunedSemiJoin(fact: DataFrame, factKey: Column,
                     dim: DataFrame, dimKey: Column,
                     expectedItems: Long = 1000000L,
                     fpp: Double = 0.03): DataFrame = {
    val sameType = dim.select(dimKey).schema.head.dataType ==
      fact.select(factKey).schema.head.dataType
    val (dk, fk) =
      if (sameType) (dimKey, factKey)
      else (dimKey.cast("string"), factKey.cast("string"))
    val bytes = bloomBytesOf(dim, dk, expectedItems, fpp)
    fact.filter(mightContain(bytes, fk))
      .join(dim.select(dimKey.as("__bloom_k")).distinct(),
        factKey === col("__bloom_k"), "left_semi")
  }
}
