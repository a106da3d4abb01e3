package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * SIGMOD 2003, the MOSS algorithm): k-gram rolling hashes, then the
  * minimum hash per sliding window of `w` consecutive k-grams (rightmost
  * min on ties). Guarantees: any shared substring of length ≥ w+k-1
  * yields at least one shared fingerprint — LOCAL containment detection
  * (quotes, boilerplate, partial copies), which global-similarity
  * MinHash misses by design.
  */
object WinnowKernels {

  def fingerprints(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val t = SketchKernels.normalize(text)
    val n = t.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + t.charAt(j); j += 1 }
      hashes(i) = SketchKernels.mix64(h)
      i += 1
    }
    if (n <= w) return Array(hashes.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start <= n - w) {
      var minIdx = start
      var j2 = start + 1
      while (j2 < start + w) {
        if (hashes(j2) <= hashes(minIdx)) minIdx = j2 // rightmost min
        j2 += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    out.toArray
  }

  def fingerprintArray(text: UTF8String, k: Int, w: Int): GenericArrayData =
    new GenericArrayData(fingerprints(if (text == null) null else text.toString, k, w))
}

/** `winnow_fingerprints(text)` → array<bigint> (codegen'd). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(input: Any): Any =
    WinnowKernels.fingerprintArray(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llmops.WinnowKernels.fingerprintArray($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

object Winnowing {

  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 12): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(text), k, w))

  /** Containment pairs: docs sharing ≥ `minShared` fingerprints.
    * Scale shape: explode fingerprints (slim (id, fp) rows), drop
    * fingerprints appearing in more than `maxDocFreq` docs (boilerplate
    * — the classic stop-fingerprint step, and the guard against
    * quadratic fan-out when many docs share a substring), self-join on
    * the surviving fps, count shared per pair. Pair count per fp is
    * then bounded by maxDocFreq², keeping the join linear in corpus
    * size.
    */
  def containmentPairs(docs: DataFrame, minShared: Int = 3,
                       k: Int = 8, w: Int = 12, maxDocFreq: Int = 50,
                       idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    // fps feed three branches (the df count, the slim join, and through
    // it both self-join sides); checkpoint so the O(len·w) fingerprint
    // kernel runs once per doc. The exploded fp table is comparable in
    // size to the text — at corpus scale persist it to a table instead
    // and df-filter there.
    val fps = docs.select(col(idCol).as("id"),
      explode(array_distinct(winnow_fingerprints(col(textCol), k, w))).as("fp"))
      .localCheckpoint(false)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select(col("fp"))
    val slim = fps.join(rare, Seq("fp"))
    slim.select(col("fp"), col("id").as("id_a"))
      .join(slim.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }
}
