package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear rolling hash, the FastCDC family):
  * chunk boundaries are a function of the CONTENT'S trailing bytes,
  * not of byte offsets — so inserting or deleting a span early in a
  * document moves only the chunks that cover the edit, and every chunk
  * after the hash re-synchronizes keeps its identity (same bytes, same
  * chunk hash). Fixed-size chunking loses ALL alignment after one
  * insertion; CDC is why storage-level dedup (restic/borg/LBFS,
  * Dropbox) survives edits, and here it is the sub-document
  * counterpart of the span dedup tier: near-identical large documents
  * (versioned dumps, boilerplate-wrapped bodies) share most chunk
  * hashes, so `chunk_hash` group-bys find repeated REGIONS across a
  * corpus without any pairwise comparison.
  *
  * Mechanics: roll h = (h << 1) + gear(byte) over UTF-8 bytes (the
  * gear table is splitmix64-derived, fixed); after at least `minSize`
  * bytes since the last boundary, a byte position with
  * (h & (2^maskBits − 1)) == 0 ends the chunk (expected chunk size ≈
  * 2^maskBits + minSize); `maxSize` forces a boundary so adversarial
  * content can't produce unbounded chunks. The shift decays a byte's
  * influence after 64 positions, which is exactly the
  * re-synchronization window. Everything is per-row codegen
  * arithmetic — no shuffle, no state; the operator scales like any
  * scalar projection.
  */
object Cdc {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fixed random-looking per-byte increments (the "gear"). */
  private val gear: Array[Long] = Array.tabulate(256)(i => mix64(i.toLong))

  /** FNV-1a 64 over a byte range — the chunk's content identity. */
  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xFF).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Boundary spans over raw bytes: (start, len, fnv1a hash) per
    * chunk, covering [0, bytes.length) exactly. Empty input → empty.
    */
  def chunkSpans(bytes: Array[Byte], maskBits: Int, minSize: Int,
                 maxSize: Int): Array[(Int, Int, Long)] = {
    val n = bytes.length
    if (n == 0) return Array.empty
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize || i == n - 1) {
        out += ((start, len, fnv1a(bytes, start, i + 1)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    out.toArray
  }

  /** Boxed kernel for [[CdcSpans]]: array<struct<start, len, hash>>
    * over the UTF-8 bytes of `s`.
    */
  def spansBoxed(s: UTF8String, maskBits: Int, minSize: Int,
                 maxSize: Int): ArrayData = {
    val spans = chunkSpans(s.getBytes, maskBits, minSize, maxSize)
    val rows = new Array[Any](spans.length)
    var i = 0
    while (i < spans.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](spans(i)._1, spans(i)._2, spans(i)._3))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** `cdc_spans(text)` as a Column. */
  def cdcSpans(text: Column, maskBits: Int = 6, minSize: Int = 16,
               maxSize: Int = 256): Column =
    ColumnBridge.column(
      CdcSpans(ColumnBridge.expression(text), maskBits, minSize, maxSize))

  /** One row per chunk: passthrough columns + (chunk_idx, start, len,
    * chunk_hash), byte offsets into the document's UTF-8 encoding.
    * Group by `chunk_hash` downstream to find content regions repeated
    * across the corpus.
    */
  def cdcChunks(docs: DataFrame, maskBits: Int = 6, minSize: Int = 16,
                maxSize: Int = 256, textCol: String = "text"): DataFrame = {
    require(maskBits >= 1 && maskBits <= 28, "maskBits in [1, 28]")
    require(minSize >= 1 && maxSize >= minSize,
      "need 1 <= minSize <= maxSize")
    val passthrough = docs.columns.filterNot(_ == textCol).map(col)
    docs
      .withColumn("__spans",
        cdcSpans(col(textCol), maskBits, minSize, maxSize))
      .select(passthrough :+
        posexplode(col("__spans")).as(Seq("chunk_idx", "__s")): _*)
      .select(passthrough ++ Seq(
        col("chunk_idx"),
        col("__s.start").as("start"),
        col("__s.len").as("len"),
        col("__s.hash").as("chunk_hash")): _*)
  }
}

/** `cdc_spans(text)` → array<struct<start int, len int, hash bigint>>:
  * content-defined chunk spans of the UTF-8 encoding (see [[Cdc]]).
  */
case class CdcSpans(child: Expression, maskBits: Int, minSize: Int,
                    maxSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = CdcSpans.resultType
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_spans"

  override def nullSafeEval(input: Any): Any =
    Cdc.spansBoxed(input.asInstanceOf[UTF8String], maskBits, minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cdcSpans")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.llmops.Cdc.spansBoxed($c, $maskBits, $minSize, $maxSize);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CdcSpans =
    copy(child = c)
}

object CdcSpans {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))),
    containsNull = false)
}
