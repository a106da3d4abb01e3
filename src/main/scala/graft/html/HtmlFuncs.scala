package graft.html

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `clean_html(html)` scalar expression (SURVEY U2/P12, codegen'd). */
case class CleanHtml(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "clean_html"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlKit.cleanHtml(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.html.HtmlKit.cleanHtml($c.toString()));")
  override protected def withNewChildInternal(c: Expression): CleanHtml =
    copy(child = c)
}

/** `extract_links(html)` Generator (SURVEY U3/S6): one page row → N link
  * rows (href, text, title, full_html). A Generator rather than an
  * array-returning UDF so rows stream out without materializing the
  * whole link array per page in the row buffer.
  */
case class ExtractLinks(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("full_html", StringType, nullable = false)))
  override def prettyName: String = "extract_links"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else HtmlKit.extractLinks(v.asInstanceOf[UTF8String].toString).map { l =>
      InternalRow(UTF8String.fromString(l.href), UTF8String.fromString(l.text),
        UTF8String.fromString(l.title), UTF8String.fromString(l.fullHtml))
    }
  }
  override protected def withNewChildInternal(c: Expression): ExtractLinks =
    copy(child = c)
}

/** `extract_tables(html)` Generator (SURVEY U4/S7): one page row → one
  * row per table row, as (table_index, row_index, cells array).
  */
case class ExtractTables(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = StructType(Seq(
    StructField("table_index", IntegerType, nullable = false),
    StructField("row_index", IntegerType, nullable = false),
    StructField("cells", ArrayType(StringType, containsNull = false), nullable = false)))
  override def prettyName: String = "extract_tables"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else for {
      (tbl, ti) <- HtmlKit.extractTables(v.asInstanceOf[UTF8String].toString).zipWithIndex
      (row, ri) <- tbl.zipWithIndex
    } yield InternalRow(ti, ri,
      new GenericArrayData(row.map(UTF8String.fromString).toArray[Any]))
  }
  override protected def withNewChildInternal(c: Expression): ExtractTables =
    copy(child = c)
}

object HtmlFuncs {
  def clean_html(html: Column): Column =
    ColumnBridge.column(CleanHtml(ColumnBridge.expression(html)))
  def extract_links(html: Column): Column =
    ColumnBridge.column(ExtractLinks(ColumnBridge.expression(html)))
  def extract_tables(html: Column): Column =
    ColumnBridge.column(ExtractTables(ColumnBridge.expression(html)))
}
