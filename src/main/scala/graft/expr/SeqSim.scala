package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftshim.ColumnBridge

/** Token-sequence similarity kernels (X234) — ORDER-AWARE companions
  * to the bag-of-ngrams metrics: ROUGE-L grades a candidate by its
  * longest common SUBSEQUENCE with the reference, crediting in-order
  * coverage without requiring contiguity (Lin 2004 §3.1), which
  * bag-of-ngram ROUGE-N cannot see (a reversed summary keeps its
  * bigram bag score; its LCS collapses).
  *
  * The kernel is the classical two-row DP over token arrays —
  * O(m·n) time, O(min(m, n)) space, bounded per row by the caller's
  * token cap — as a codegen scalar Expression like
  * [[StringSim.JaroWinkler]]: a narrow map, no shuffle, nothing
  * cross-pair. Tokens compare as exact UTF8String equality (the
  * tokenizer already case-folds).
  */
object SeqSim {

  /** LCS length over two UTF8String arrays; null tokens never match. */
  def lcsKernel(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    // the shorter side carries the DP row
    val (x, y, xn, yn) = if (n <= m) (a, b, m, n) else (b, a, n, m)
    val row = new Array[Int](yn + 1)
    var i = 0
    while (i < xn) {
      val xi = if (x.isNullAt(i)) null else x.getUTF8String(i)
      var diag = 0 // row(j) of the PREVIOUS i, i.e. dp[i-1][j-1]
      var j = 0
      while (j < yn) {
        val up = row(j + 1)
        val matches = xi != null && !y.isNullAt(j) &&
          xi.equals(y.getUTF8String(j))
        row(j + 1) =
          if (matches) diag + 1
          else if (up >= row(j)) up
          else row(j)
        diag = up
        j += 1
      }
      i += 1
    }
    row(yn)
  }

  /** `lcs_length(a, b)`: longest common subsequence length of two
    * token arrays. Codegen scalar; null array → null, empty → 0.
    */
  case class LcsLength(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "lcs_length"
    override def nullSafeEval(a: Any, b: Any): Any =
      lcsKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expr.SeqSim.lcsKernel($a, $b);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): LcsLength = copy(l, r)
  }

  def lcs_length(a: Column, b: Column): Column =
    ColumnBridge.column(LcsLength(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
