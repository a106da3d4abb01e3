package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The media decoders as native scalar expressions over `binary`
  * columns — the SQL/Column face of the kernels the `mapPartitions`
  * paths ([[Multimodal.imageDHashes]], [[Audio.audioEnergyHashes]],
  * [[Pdf.extractPdfText]]) use. Same kernels, same null contract
  * (corrupt/undecodable → null, never a throw), but composable inside
  * any projection: `spark.sql("SELECT pdf_text(content) FROM assets")`
  * runs the decode inside whole-stage codegen with no Dataset round
  * trip and no encoder boundary. Registered by
  * [[graft.GraftExtensions]].
  *
  * The typed `Dataset[Asset]` paths remain the right call when the
  * caller already carries asset metadata (media_type routing); these
  * expressions are the right call when the payload is just a column.
  */
object MediaKernels {
  def pdfTextBoxed(bytes: Array[Byte]): UTF8String =
    Pdf.PdfCodec.extractText(bytes)
      .map(UTF8String.fromString).orNull

  def imageDHashBoxed(bytes: Array[Byte]): java.lang.Long =
    Multimodal.ImageCodec.dHash64(bytes)
      .map(java.lang.Long.valueOf).orNull

  def audioEnergyHashBoxed(bytes: Array[Byte]): java.lang.Long =
    Audio.WavCodec.energyHash64(bytes)
      .map(java.lang.Long.valueOf).orNull
}

/** `pdf_text(binary)` → string: extracted show-operator text of a PDF
  * payload; null for corrupt/truncated/non-PDF bytes.
  */
case class PdfTextExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pdf_text"
  override def nullSafeEval(input: Any): Any =
    MediaKernels.pdfTextBoxed(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pdfText")
      s"""UTF8String $r = graft.llmops.MediaKernels.pdfTextBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PdfTextExpr =
    copy(child = c)
}

/** `image_dhash(binary)` → long: 64-bit perceptual dHash of an image
  * payload; null for undecodable or sub-grid images.
  */
case class ImageDHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"
  override def nullSafeEval(input: Any): Any =
    MediaKernels.imageDHashBoxed(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dhash")
      s"""java.lang.Long $r = graft.llmops.MediaKernels.imageDHashBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ImageDHash =
    copy(child = c)
}

/** `audio_energy_hash(binary)` → long: 64-bit energy dHash of a
  * WAV/PCM payload; null for undecodable or sub-65-frame clips.
  */
case class AudioEnergyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_energy_hash"
  override def nullSafeEval(input: Any): Any =
    MediaKernels.audioEnergyHashBoxed(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ehash")
      s"""java.lang.Long $r = graft.llmops.MediaKernels.audioEnergyHashBoxed($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AudioEnergyHash =
    copy(child = c)
}

object MediaExprs {
  def pdf_text(content: Column): Column =
    ColumnBridge.column(PdfTextExpr(ColumnBridge.expression(content)))
  def image_dhash(content: Column): Column =
    ColumnBridge.column(ImageDHash(ColumnBridge.expression(content)))
  def audio_energy_hash(content: Column): Column =
    ColumnBridge.column(AudioEnergyHash(ColumnBridge.expression(content)))
}
