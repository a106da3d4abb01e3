package graft.llmops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge, LongInputTypes, StringInputTypes}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-item and distinct-set sketches — the bounded-memory
  * aggregation tier for corpus statistics that a plain `groupBy` can't
  * deliver at 100 TB:
  *
  *  - [[MisraGries]]: mergeable heavy-hitters summary. "Which tokens /
  *    domains / templates dominate the corpus" without shuffling one
  *    row per distinct item — state is ≤ k (item, counter) pairs per
  *    partition, merged with the Agarwal et al. (PODS 2012, "Mergeable
  *    summaries") rule, so the exchange carries ≤ partitions·k slim
  *    entries no matter how many distinct items exist. Guarantee:
  *    estimates never overcount, undercount by at most n/(k+1), and
  *    every item with true count > n/(k+1) is present in the summary.
  *  - [[KmvMinK]]: bottom-k distinct-hash sketch (KMV, Bar-Yossef et
  *    al. 2002). Union/intersection composable where HLL is
  *    union-only: the k smallest hashes of a set are a uniform sample
  *    of its distinct elements, so two corpora's sketches estimate
  *    their Jaccard overlap — the "how contaminated is corpus A with
  *    corpus B" number — from 2·k longs, no join over the corpora.
  *
  * The reference has no sketch tier (its scale ends at one ticker list,
  * `config.py:8-44`); these are the engine's scale path for the same
  * "what's in this crawl" reporting its summary stage does by exact
  * count (`orchestrator.py:210-260`).
  */
object Freq {

  /** Misra-Gries heavy-hitters summary of a string item column:
    * `array<struct<item, est>>` sorted by estimate desc. `k` bounds the
    * aggregation state (≤ k counters per partition); any item with
    * frequency above n/(k+1) is guaranteed present with
    * `n_true − n/(k+1) ≤ est ≤ n_true`.
    */
  def freqItems(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item.cast("string")), k)
        .toAggregateExpression())

  /** Bottom-k sketch of a pre-hashed long column (use `xxhash64(x)`):
    * the k smallest distinct hash values, ascending. Exact distinct set
    * when the group has ≤ k distinct hashes; a mergeable uniform
    * distinct-sample otherwise.
    */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinK(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())

  /** Jaccard estimate from two [[kmvSketch]] arrays: the fraction of
    * the union's bottom-k that lies in both sketches (the standard KMV
    * resemblance estimator). Exact when the union fits in k. Pure
    * array arithmetic on 2·k longs — evaluate it on the 1×1 cross join
    * of two per-corpus aggregation rows. Two empty sketches (empty or
    * all-null corpora) estimate J = 0.0 — guarded explicitly because
    * the denominator would otherwise be 0 and ANSI mode makes that an
    * error, not a null.
    */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val u = slice(array_sort(array_union(a, b)), 1, k)
    when(size(u) === 0, lit(0.0)).otherwise(
      size(array_intersect(u, array_intersect(a, b))).cast("double") /
        least(lit(k), size(u)).cast("double"))
  }

  // ---- driver-space merges over the aggregates' OUTPUT values ------------
  //
  // Mergeability is the whole point of the MG/KMV constructions: a
  // per-shard (or per-micro-batch) summary merges into a summary OF THE
  // UNION with the same guarantees. Inside one query Spark's partial
  // aggregation does this on the buffers; these functions do the same
  // on the eval outputs, which is what cross-job composition needs —
  // [[graft.streaming.SketchStreams]] folds one bounded row per
  // micro-batch into a running corpus summary with them.

  /** Merge two Misra-Gries summaries (Agarwal et al. 2012): sum
    * counters pointwise; if more than k survive, subtract the
    * (k+1)-th largest value and keep the positive ones. The combined
    * undercount stays ≤ n_total/(k+1). Result ordered est desc, item
    * asc — the same order [[MisraGries]] evals.
    */
  def mergeFreqSummaries(a: Seq[(String, Long)], b: Seq[(String, Long)],
                         k: Int): Seq[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (i, c) =>
      m.update(i, m.getOrElse(i, 0L) + c)
    }
    val kept =
      if (m.size <= k) m.toSeq
      else {
        val vals = m.values.toArray
        java.util.Arrays.sort(vals)
        val off = vals(vals.length - k - 1)
        m.iterator.collect { case (i, c) if c > off => (i, c - off) }.toSeq
      }
    kept.sortBy { case (i, c) => (-c, i) }
  }

  /** Merge two KMV sketches: the k smallest distinct hashes of the
    * union — exactly the sketch the union itself would produce
    * (order/merge-tree independent).
    */
  def mergeKmvSketches(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Driver-space [[kmvJaccard]] — same estimator, same empty-union
    * guard, for merged sketch values held outside a DataFrame.
    */
  def kmvJaccardValue(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val u = (a ++ b).distinct.sorted.take(k)
    if (u.isEmpty) 0.0
    else {
      val inter = a.toSet.intersect(b.toSet)
      u.count(inter.contains).toDouble / math.min(k, u.size)
    }
  }

  /** Count-Min sketch of a string item column: `depth·width` longs,
    * row-major, mergeable by elementwise addition. Query with
    * [[cmEstimate]].
    */
  def cmSketch(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMin(ColumnBridge.expression(item.cast("string")), depth, width)
        .toAggregateExpression())

  /** Point-frequency estimate from a [[cmSketch]] array — pure Column
    * arithmetic over the evaled cells (min over the depth rows at
    * `pmod(xxhash64(item, i), width)`), so the query side runs
    * anywhere Spark's xxhash64 does, sketch broadcast with the row.
    * Never undercounts; overcount bounded as documented on
    * [[CountMin]].
    */
  def cmEstimate(sketch: Column, item: Column,
                 depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    // xxhash64 SKIPS null children rather than returning null, so an
    // un-guarded null item would walk real buckets and report a
    // spurious count for an item the aggregate never inserted
    when(item.isNull, lit(null).cast("long")).otherwise(
      array_min(transform(sequence(lit(0), lit(depth - 1)), i =>
        element_at(sketch,
          (i * width +
            pmod(xxhash64(item.cast("string"), i.cast("long")), lit(width))
          ).cast("int") + 1))))
  }

  /** Driver-space merge of two [[cmSketch]] cell arrays (elementwise
    * add) — the cross-job composition seam, like
    * [[mergeFreqSummaries]]/[[mergeKmvSketches]]. The flat cell array
    * carries no shape, so the caller passes the (depth, width) both
    * sketches were built with — a same-length different-shape merge
    * would silently sum cross-row cells into garbage estimates.
    */
  def mergeCmSketches(a: Seq[Long], b: Seq[Long],
                      depth: Int, width: Int): Seq[Long] = {
    val expect = depth.toLong * width
    require(a.length == expect && b.length == expect,
      s"sketch shapes differ from depth=$depth x width=$width: " +
        s"${a.length} vs ${b.length} cells (expected $expect)")
    a.zip(b).map { case (x, y) => x + y }
  }
}

/** Bounded counter table: the Misra-Gries aggregation state. */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
}

/** Misra-Gries frequent-items summary as a native Catalyst
  * `TypedImperativeAggregate`.
  *
  * Scale rationale: exact heavy-hitters via `groupBy(item).count()`
  * shuffles one row per distinct item — at corpus scale (distinct
  * tokens/URLs/templates ~ billions) that is a full-corpus exchange to
  * answer a top-handful question. This summary keeps ≤ k counters per
  * partition map-side and merges them with the counter-offset rule of
  * Agarwal et al. 2012, so error bounds survive arbitrary merge trees
  * (partial aggregation, AQE re-plans). Deterministic given the input
  * multiset — no RNG, so reruns and repartitioning reproduce the
  * summary's guarantees (though the *estimates* depend on arrival
  * order only through the bounds, which is what the q106 contract
  * checks).
  *
  * Output: `array<struct<item: string, est: bigint>>`, est desc then
  * item asc.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression]
    with StringInputTypes {
  require(k >= 1 && k <= MisraGries.maxK,
    s"k must be in [1, ${MisraGries.maxK}], got $k")

  override def prettyName: String = "freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGries.resultType

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val cur = b.counts.get(item)
      if (cur != null) b.counts.put(item, cur + 1L)
      else if (b.counts.size < b.k) b.counts.put(item.clone(), 1L)
      else {
        // full and unseen: decrement every counter (the shared "charge
        // one occurrence of k+1 distinct items" step), dropping zeros
        val it = b.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    b
  }

  /** Mergeable-summaries rule: sum counters pointwise; if more than k
    * survive, subtract the (k+1)-th largest counter value from all and
    * keep the positive ones. The undercount bound stays ≤ n/(k+1) for
    * the combined stream.
    */
  override def merge(a: MgBuffer, other: MgBuffer): MgBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.counts.get(e.getKey)
      a.counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.counts.size > a.k) {
      val vals = new Array[Long](a.counts.size)
      var i = 0
      val vi = a.counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - a.k - 1) // (k+1)-th largest
      val ei = a.counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= m) ei.remove() else e.setValue(e.getValue - m)
      }
    }
    a
  }

  override def eval(b: MgBuffer): Any = {
    val entries = new Array[(UTF8String, Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    var bytes = 8
    val it0 = b.counts.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(b.k).putInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ib = e.getKey.getBytes
      bb.putInt(ib.length).put(ib).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MgBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val ib = new Array[Byte](len)
      bb.get(ib)
      b.counts.put(UTF8String.fromBytes(ib), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** State-size guard, same rationale as [[CollectTopK.maxK]]. */
  val maxK: Int = 4096

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)
}

/** Sorted distinct bottom-k longs: the KMV aggregation state. */
final class KmvBuffer(val k: Int) {
  var n: Int = 0
  val hs = new Array[Long](k)
}

/** Bottom-k (KMV) distinct sketch over a pre-hashed long column as a
  * native `TypedImperativeAggregate`: keeps the k smallest DISTINCT
  * hash values seen. Merge = sorted-merge keeping the k smallest, so
  * the sketch of a union is computable from per-shard sketches — the
  * property HLL lacks an intersection analog for, and the reason this
  * is the corpus-overlap estimator (see [[Freq.kmvJaccard]]).
  * Deterministic: the state is a pure function of the input's distinct
  * hash set, independent of arrival or merge order.
  */
case class KmvMinK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression]
    with LongInputTypes {
  require(k >= 1 && k <= KmvMinK.maxK,
    s"k must be in [1, ${KmvMinK.maxK}], got $k")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  private def insert(b: KmvBuffer, h: Long): Unit = {
    if (b.n >= b.k && h >= b.hs(b.n - 1)) {
      if (h == b.hs(b.n - 1)) return // duplicate of current max
      return // larger than the kept bottom-k
    }
    var pos = java.util.Arrays.binarySearch(b.hs, 0, b.n, h)
    if (pos >= 0) return // already present
    pos = -pos - 1
    val last = math.min(b.n, b.k - 1)
    var i = last
    while (i > pos) { b.hs(i) = b.hs(i - 1); i -= 1 }
    b.hs(pos) = h
    if (b.n < b.k) b.n += 1
  }

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(a: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var j = 0
    while (j < other.n) { insert(a, other.hs(j)); j += 1 }
    a
  }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(b.hs, b.n))

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt)
    b.n = bb.getInt
    var i = 0
    while (i < b.n) { b.hs(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMinK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinK =
    copy(child = newChild)
}

object KmvMinK {
  /** State-size guard: 64 KiB of longs per group is the ceiling. */
  val maxK: Int = 8192
}

/** depth×width counter matrix, row-major: the Count-Min state. */
final class CmBuffer(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a string item
  * column as a native `TypedImperativeAggregate` — the point-frequency
  * member of the sketch tier: [[MisraGries]] answers "which items are
  * heavy", Count-Min answers "how often is THIS item" for any item,
  * in `depth × width` longs of mergeable state (merge = elementwise
  * add, so per-shard sketches sum into the union's sketch exactly).
  *
  * Guarantee: estimates never undercount; with width w the expected
  * overcount is n/w per hash row and the reported estimate is the MIN
  * over `depth` independent rows (P[over > e·n/w] ≤ e^−depth).
  *
  * Hashing: row i buckets at `pmod(xxhash64(item, i::long), width)` —
  * the EXACT arithmetic of Spark's `xxhash64(col, lit(i))` (seed 42,
  * string then long), reproduced here via the public XXH64 kernels, so
  * the ESTIMATE side is a pure Column expression over the evaled
  * array ([[Freq.cmEstimate]]) and any engine with xxhash64 replays
  * the bucket walk.
  */
case class CountMin(child: Expression, depth: Int, width: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmBuffer] with UnaryLike[Expression]
    with StringInputTypes {
  require(depth >= 1 && depth <= CountMin.maxDepth,
    s"depth must be in [1, ${CountMin.maxDepth}], got $depth")
  require(width >= 1 && width.toLong * depth <= CountMin.maxCells,
    s"depth*width must be <= ${CountMin.maxCells}")

  override def prettyName: String = "count_min"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmBuffer =
    new CmBuffer(depth, width)

  override def update(b: CmBuffer, input: InternalRow): CmBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val base = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(v.asInstanceOf[UTF8String], 42L)
      var i = 0
      while (i < depth) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(i.toLong, base)
        b.cells(i * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        i += 1
      }
    }
    b
  }

  override def merge(a: CmBuffer, other: CmBuffer): CmBuffer = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += other.cells(i); i += 1 }
    a
  }

  override def eval(b: CmBuffer): Any = {
    val out = new Array[Any](b.cells.length)
    var i = 0
    while (i < out.length) { out(i) = b.cells(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: CmBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.cells.length * 8)
    bb.putInt(b.depth).putInt(b.width)
    var i = 0
    while (i < b.cells.length) { bb.putLong(b.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CmBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < b.cells.length) { b.cells(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

object CountMin {
  /** State-size guards, same rationale as [[CollectTopK.maxK]]. */
  val maxDepth: Int = 16
  val maxCells: Long = 1 << 22
}
