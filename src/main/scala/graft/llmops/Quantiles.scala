package graft.llmops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnBridge, DoubleInputTypes}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches — the rank tier of the bounded-memory
  * sketch family ([[Freq]]: heavy hitters + distinct; here: "what is
  * the p99 document length of a 100 TB corpus" without a global sort).
  *
  * [[TDigestAgg]] is Dunning's merging t-digest (Dunning & Ertl,
  * "Computing extremely accurate quantiles using t-digests", 2019):
  * the sketch is ≤ O(δ) (mean, weight) centroids whose sizes follow
  * the k₁ scale function δ/(2π)·asin(2q−1) — tiny clusters at the
  * tails, big ones in the middle — so rank error concentrates where
  * quantiles are flat and p99/p999 stay sharp. Exchange cost is
  * partitions·O(δ) slim pairs regardless of row count, and the merge
  * rule (concatenate, re-compress) is closed under arbitrary merge
  * trees — partial aggregation, AQE re-plans, cross-job folds
  * ([[mergeTDigests]]) all preserve the bound.
  *
  * Like every mergeable quantile summary, the exact centroid layout
  * depends on arrival/merge order; what is ORDER-INDEPENDENT is the
  * guarantee, so correctness is pinned the way q104 pins Spark's own
  * GK sketch: realized rank of the estimate within ε of the requested
  * quantile (the q175 oracle emits the contract booleans plus exact
  * quantiles, both deterministic).
  *
  * The reference computes no quantiles at all (its stats are exact
  * counts over one ticker list); this tier exists for the corpus-scale
  * length/score/latency distributions its summary stage prints
  * exactly.
  */
object Quantiles {

  /** t-digest of a double column: `array<struct<mean, weight>>`,
    * centroids ascending by mean. `compression` (δ) bounds the state:
    * ≤ ~⌈δ/2⌉ + buffering centroids per partition, rank error
    * empirically ≤ ~1/δ at the median and far smaller at the tails.
    */
  def tdigestAgg(value: Column, compression: Int = 100): Column =
    ColumnBridge.column(
      TDigestAgg(ColumnBridge.expression(value.cast("double")), compression)
        .toAggregateExpression())

  /** Quantile estimate from a [[tdigestAgg]] digest column: linear
    * interpolation between centroid mean midpoints (the standard
    * t-digest estimator). Null/empty digest → null.
    */
  def tdigestQuantile(digest: Column, q: Double): Column =
    ColumnBridge.column(
      TDigestQuantile(ColumnBridge.expression(digest), q))

  /** Driver-space merge of two digest VALUES (eval outputs) — the
    * cross-job / per-micro-batch fold, same shape as
    * [[Freq.mergeFreqSummaries]]: concatenate centroids, one
    * re-compression pass. The result carries the union's guarantee.
    */
  def mergeTDigests(a: Seq[(Double, Double)], b: Seq[(Double, Double)],
                    compression: Int = 100): Seq[(Double, Double)] = {
    val buf = new TdBuffer(compression)
    (a.iterator ++ b.iterator).foreach { case (m, w) => buf.append(m, w) }
    TDigest.compress(buf)
    (0 until buf.n).map(i => (buf.means(i), buf.weights(i)))
  }

  /** Driver-space quantile from a digest value held outside a
    * DataFrame (merged fold state). NaN for an empty digest.
    */
  def tdigestQuantileValue(centroids: Seq[(Double, Double)],
                           q: Double): Double = {
    val n = centroids.length
    if (n == 0) return Double.NaN
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    centroids.foreach { case (m, w) => means(i) = m; weights(i) = w; i += 1 }
    TDigest.quantileOf(means, weights, n, q)
  }
}

/** Growable centroid scratchpad: entries may be unsorted and
  * uncompressed between [[TDigest.compress]] passes; `total` tracks
  * the summed weight so compression never re-scans.
  */
final class TdBuffer(val compression: Int) {
  var means: Array[Double] = new Array[Double](64)
  var weights: Array[Double] = new Array[Double](64)
  var n: Int = 0
  var total: Double = 0.0

  def append(mean: Double, weight: Double): Unit = {
    if (n == means.length) {
      means = java.util.Arrays.copyOf(means, n * 2)
      weights = java.util.Arrays.copyOf(weights, n * 2)
    }
    means(n) = mean
    weights(n) = weight
    n += 1
    total += weight
  }
}

object TDigest {
  /** State-size guard, same rationale as [[MisraGries.maxK]]. */
  val maxCompression: Int = 4096

  /** Pending-entry slack before an in-place compression: buffering
    * amortizes the sort (one compress per ~7δ appends) while keeping
    * the buffer O(δ).
    */
  private def capacity(compression: Int): Int = 8 * compression

  /** The k₁ scale function δ/(2π)·asin(2q−1): steep at q→0 and q→1
    * (small tail clusters), flat at the median (big middle clusters).
    */
  private def kScale(q: Double, delta: Int): Double = {
    val c = math.min(1.0, math.max(0.0, q))
    delta / (2.0 * math.Pi) * math.asin(2.0 * c - 1.0)
  }

  /** One merge pass (Dunning's merging digest): sort centroids by
    * mean, then greedily coalesce neighbors while the cluster spans
    * ≤ 1 unit of k-scale. In place; idempotent at the fixed point.
    */
  def compress(b: TdBuffer): Unit = {
    if (b.n <= 1) return
    val order = Array.range(0, b.n)
      .sortBy(i => b.means(i)) // stable: equal means keep append order
    val ms = new Array[Double](b.n)
    val ws = new Array[Double](b.n)
    var i = 0
    while (i < b.n) { ms(i) = b.means(order(i)); ws(i) = b.weights(order(i)); i += 1 }

    val total = b.total
    var on = 0
    var curM = ms(0)
    var curW = ws(0)
    var wSoFar = 0.0
    var kLeft = kScale(0.0, b.compression)
    i = 1
    while (i < b.n) {
      val q = (wSoFar + curW + ws(i)) / total
      if (kScale(q, b.compression) - kLeft <= 1.0) {
        val w2 = curW + ws(i)
        curM += (ms(i) - curM) * ws(i) / w2
        curW = w2
      } else {
        b.means(on) = curM
        b.weights(on) = curW
        on += 1
        wSoFar += curW
        kLeft = kScale(wSoFar / total, b.compression)
        curM = ms(i)
        curW = ws(i)
      }
      i += 1
    }
    b.means(on) = curM
    b.weights(on) = curW
    b.n = on + 1
    b.total = total
  }

  private[llmops] def maybeCompress(b: TdBuffer): Unit =
    if (b.n >= capacity(b.compression)) compress(b)

  /** Quantile by interpolation between centroid midpoints over
    * mean-ascending centroids; clamps to the extreme means outside
    * the first/last midpoint (the conventional estimator).
    */
  def quantileOf(means: Array[Double], weights: Array[Double],
                 n: Int, q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    if (n == 1) return means(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = q * total
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = means(0)
    i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2.0
      if (target < mid) {
        return if (i == 0) means(0)
        else prevMean + (means(i) - prevMean) * (target - prevMid) / (mid - prevMid)
      }
      cum += weights(i)
      prevMid = mid
      prevMean = means(i)
      i += 1
    }
    means(n - 1)
  }

  /** Boxed kernel for [[TDigestQuantile]]'s eval/codegen: digest rows
    * are (mean, weight) structs ascending by mean (the agg's eval
    * order). Empty array → null.
    */
  def quantileBoxed(arr: ArrayData, q: Double): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return null
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      means(i) = row.getDouble(0)
      weights(i) = row.getDouble(1)
      i += 1
    }
    java.lang.Double.valueOf(quantileOf(means, weights, n, q))
  }

  val centroidType: StructType = StructType(Seq(
    StructField("mean", DoubleType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))
  val resultType: DataType = ArrayType(centroidType, containsNull = false)
}

/** Merging t-digest as a native Catalyst `TypedImperativeAggregate`
  * (see [[Quantiles]] for the contract). Buffer = O(δ) centroid pairs;
  * update appends weight-1 points and compresses every ~7δ appends;
  * merge concatenates and compresses — the Agarwal-style mergeable
  * shape, so partial aggregation and AQE re-plans preserve the bound.
  */
case class TDigestAgg(child: Expression, compression: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TdBuffer] with UnaryLike[Expression]
    with DoubleInputTypes {
  require(compression >= 10 && compression <= TDigest.maxCompression,
    s"compression must be in [10, ${TDigest.maxCompression}], got $compression")

  override def prettyName: String = "tdigest"
  override def nullable: Boolean = false
  override def dataType: DataType = TDigest.resultType

  override def createAggregationBuffer(): TdBuffer = new TdBuffer(compression)

  override def update(b: TdBuffer, input: InternalRow): TdBuffer = {
    val v = child.eval(input)
    if (v != null) {
      b.append(v.asInstanceOf[Double], 1.0)
      TDigest.maybeCompress(b)
    }
    b
  }

  override def merge(a: TdBuffer, other: TdBuffer): TdBuffer = {
    var i = 0
    while (i < other.n) {
      a.append(other.means(i), other.weights(i))
      TDigest.maybeCompress(a)
      i += 1
    }
    a
  }

  override def eval(b: TdBuffer): Any = {
    TDigest.compress(b)
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = new GenericInternalRow(
        Array[Any](b.means(i), b.weights(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TdBuffer): Array[Byte] = {
    TDigest.compress(b) // ship the bounded form, not the raw buffer
    val bb = ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.compression).putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putDouble(b.means(i)).putDouble(b.weights(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TdBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TdBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      b.append(bb.getDouble, bb.getDouble)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

/** `tdigest_quantile(digest, q)` → double: the interpolated quantile
  * estimate of a [[TDigestAgg]] value. Evaluated on aggregated rows
  * (one digest per group), so the work per row is O(centroids) ≤ O(δ).
  */
case class TDigestQuantile(child: Expression, q: Double)
    extends UnaryExpression {
  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  override def nullSafeEval(input: Any): Any =
    TDigest.quantileBoxed(input.asInstanceOf[ArrayData], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("tdq")
      s"""java.lang.Double $r = graft.llmops.TDigest.quantileBoxed($c, $q);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TDigestQuantile =
    copy(child = c)
}
