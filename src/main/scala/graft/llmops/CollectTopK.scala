package graft.llmops

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.LongDoubleInputTypes
import org.apache.spark.sql.types._

/** Bounded top-k buffer: parallel arrays sorted by the window order
  * (score desc NULLS LAST, id asc NULLS FIRST — Spark's defaults for
  * `orderBy(score.desc, id)`), capped at k entries. Linear insertion —
  * k is small (≤ [[CollectTopK.maxK]]) and rows that can't enter the
  * buffer are rejected with one comparison against the current floor.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  val idNulls = new Array[Boolean](k)
  val scoreNulls = new Array[Boolean](k)
}

/** Exact distributed per-group top-k as a native Catalyst
  * `TypedImperativeAggregate` — the engine-level kernel behind
  * [[TopK.topK]] and the [[graft.plans.RewriteWindowTopK]] optimizer
  * rule.
  *
  * Scale rationale (same as the round-1 review's finding): the
  * rank-window formulation shuffles EVERY scored row into |groups|
  * reducers; this aggregate keeps ≤ k candidates per partition per
  * group map-side, so the exchange carries ≤ partitions·|groups|·k
  * slim (id, score) pairs and the reduce side merges k-sorted lists.
  * Results are bit-identical to
  * `row_number().over(partitionBy(g).orderBy(score.desc, id)) <= k`:
  * the buffer comparator reproduces Spark's null ordering (desc →
  * NULLS LAST, asc → NULLS FIRST), treats -0.0 == 0.0 for ORDERING
  * while emitting the original score value (like the window does), and
  * ranks NaN above +∞ exactly like Spark's double ordering. Inputs are
  * implicitly cast (so `int` ids work from SQL), and non-castable
  * id/score types fail analysis, not execution.
  *
  * Output: `array<struct<_1: bigint, _2: double>>` sorted by rank —
  * field names match the tuple-encoder schema the original UDAF
  * produced, so downstream `t._1` / `t._2` consumers are unchanged.
  */
case class CollectTopK(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
    with LongDoubleInputTypes {
  require(k >= 1 && k <= CollectTopK.maxK,
    s"k must be in [1, ${CollectTopK.maxK}], got $k")

  private def idExpr = left
  private def scoreExpr = right

  override def prettyName: String = "collect_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = CollectTopK.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  /** Spark's total order for `(score desc, id asc)` with default null
    * ordering and NaN-largest double semantics: does entry a rank
    * strictly before entry b?
    */
  private def beats(aIdN: Boolean, aId: Long, aSN: Boolean, aS: Double,
                    bIdN: Boolean, bId: Long, bSN: Boolean, bS: Double)
      : Boolean = {
    if (aSN != bSN) return !aSN // desc → non-null scores first
    if (!aSN) {
      // Double.compare: NaN > +Inf (Spark's ordering); + 0.0 collapses
      // -0.0 onto 0.0 for COMPARISON only — the stored (and emitted)
      // value keeps its original sign, matching the window plan
      val c = java.lang.Double.compare(aS + 0.0, bS + 0.0)
      if (c != 0) return c > 0 // desc
    }
    if (aIdN != bIdN) return aIdN // asc → null ids first
    if (!aIdN && aId != bId) return aId < bId
    false
  }

  private def insert(b: TopKBuffer, idN: Boolean, id: Long,
                     sN: Boolean, s0: Double): Unit = {
    val s = if (sN) 0.0 else s0 // placeholder when null; original bits kept
    if (b.n >= b.k &&
        !beats(idN, id, sN, s,
               b.idNulls(b.n - 1), b.ids(b.n - 1),
               b.scoreNulls(b.n - 1), b.scores(b.n - 1))) return
    var pos = 0
    while (pos < b.n &&
           !beats(idN, id, sN, s,
                  b.idNulls(pos), b.ids(pos), b.scoreNulls(pos),
                  b.scores(pos))) pos += 1
    val last = math.min(b.n, b.k - 1)
    var i = last
    while (i > pos) {
      b.ids(i) = b.ids(i - 1); b.scores(i) = b.scores(i - 1)
      b.idNulls(i) = b.idNulls(i - 1); b.scoreNulls(i) = b.scoreNulls(i - 1)
      i -= 1
    }
    b.ids(pos) = id; b.scores(pos) = s
    b.idNulls(pos) = idN; b.scoreNulls(pos) = sN
    if (b.n < b.k) b.n += 1
  }

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idV = idExpr.eval(input)
    val sV = scoreExpr.eval(input)
    insert(b,
      idV == null, if (idV == null) 0L else idV.asInstanceOf[Long],
      sV == null, if (sV == null) 0.0 else sV.asInstanceOf[Double])
    b
  }

  override def merge(a: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val out = new TopKBuffer(k)
    var i = 0
    var j = 0
    while (out.n < k && (i < a.n || j < other.n)) {
      val takeA = j >= other.n || (i < a.n &&
        beats(a.idNulls(i), a.ids(i), a.scoreNulls(i), a.scores(i),
              other.idNulls(j), other.ids(j), other.scoreNulls(j),
              other.scores(j)))
      if (takeA) {
        out.ids(out.n) = a.ids(i); out.scores(out.n) = a.scores(i)
        out.idNulls(out.n) = a.idNulls(i); out.scoreNulls(out.n) = a.scoreNulls(i)
        i += 1
      } else {
        out.ids(out.n) = other.ids(j); out.scores(out.n) = other.scores(j)
        out.idNulls(out.n) = other.idNulls(j)
        out.scoreNulls(out.n) = other.scoreNulls(j)
        j += 1
      }
      out.n += 1
    }
    out
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = new GenericInternalRow(Array[Any](
        if (b.idNulls(i)) null else b.ids(i),
        if (b.scoreNulls(i)) null else b.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.n * 17)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.put((((if (b.idNulls(i)) 1 else 0)) | (if (b.scoreNulls(i)) 2 else 0)).toByte)
      bb.putLong(b.ids(i)).putDouble(b.scores(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bk = bb.getInt
    val b = new TopKBuffer(bk)
    b.n = bb.getInt
    var i = 0
    while (i < b.n) {
      val flags = bb.get()
      b.idNulls(i) = (flags & 1) != 0
      b.scoreNulls(i) = (flags & 2) != 0
      b.ids(i) = bb.getLong
      b.scores(i) = bb.getDouble
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CollectTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CollectTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CollectTopK =
    copy(left = newLeft, right = newRight)
}

object CollectTopK {
  /** Rewrite/aggregate size guard: k beyond this means the caller
    * wants a big per-group buffer, which deserves an explicit sort,
    * not a heap in aggregation state.
    */
  val maxK: Int = 1024

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("_1", LongType), StructField("_2", DoubleType))),
    containsNull = false)
}
