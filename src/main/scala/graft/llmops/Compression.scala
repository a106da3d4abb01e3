package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate size ÷ raw size of the
  * UTF-8 text. Highly repetitive or templated documents (boilerplate,
  * scraped navigation, keyword stuffing) compress far below natural
  * prose, making the ratio a cheap single-pass repetition detector
  * that complements the n-gram fraction filters ([[TextFuncs]]) —
  * n-grams catch exact token repeats, deflate catches any byte-level
  * redundancy, including markup and long-range repeats beyond the
  * n-gram horizon.
  *
  * Scale shape: a per-row kernel over the text — narrow, no shuffle,
  * and generated code calls the static kernel so the projection stays
  * inside one whole-stage-codegen span. Deflate level 1 ("fastest"):
  * the FILTER only needs redundancy discrimination, not the best
  * encoding, and level 1 is ~4× cheaper than the default on prose.
  */
object CompressionKernels {
  /** deflate(text).length / utf8ByteLength(text); empty → 1.0.
    * `nowrap = true` (raw deflate, no zlib header) so tiny inputs
    * aren't dominated by framing bytes.
    */
  def ratio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val deflater = new java.util.zip.Deflater(1, true)
    try {
      deflater.setInput(bytes)
      deflater.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!deflater.finished()) out += deflater.deflate(buf)
      out.toDouble / bytes.length
    } finally deflater.end()
  }
}

/** `compression_ratio(text)` → double in (0, ~1.1] (codegen'd). */
case class CompressionRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "compression_ratio"
  override def nullSafeEval(input: Any): Any =
    CompressionKernels.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llmops.CompressionKernels.ratio($c);")
  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
}

object Compression {
  /** Column wrapper: deflate-ratio of a text column. */
  def compressionRatio(text: Column): Column =
    ColumnBridge.column(CompressionRatio(ColumnBridge.expression(text)))
}
