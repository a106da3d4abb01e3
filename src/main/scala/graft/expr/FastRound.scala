package graft.expr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Decimal HALF_UP rounding of a double at a fixed scale, result-
  * identical to Spark's `round(col, scale)` but without its per-row
  * `BigDecimal.valueOf(double)` — that call stringifies the double
  * (`Double.toString` + decimal parse), and at 51 M ADC candidates
  * the AdcProbe measured it at ~1.9 s per evaluation pass versus
  * ~0.1 s for the entire lookup-table scoring kernel it was wrapped
  * around. A score-quantization step must not cost 20× the score.
  *
  * Fast path: y = |x|·10^scale, take floor(y + 0.5). The exact
  * decimal expansion of the binary x and the rounded binary product
  * y differ by at most half an ulp, so whenever y sits farther than
  * a few ulps from a .5 tie boundary both agree on which side the
  * value falls, and `floor(y+0.5)/10^scale` (an exact integer
  * divided by an exactly-representable power of ten, correctly
  * rounded by IEEE division) equals BigDecimal's
  * exact-decimal-then-nearest-double result bit for bit. Inputs
  * inside the guard band — or large enough that ulp(y) blurs the
  * band — take the exact BigDecimal path; for similarity scores
  * (|x| ≲ 2) the band admits ~1e-9 of inputs, so the amortized cost
  * is one multiply, one floor and one divide. FastRoundSpec pins
  * equality against Spark's round on fuzzed and adversarial inputs,
  * tie boundaries and specials included.
  */
object FastRound {

  /** scale ∈ [0, 15]: 10^scale stays exactly representable and the
    * band arithmetic sound. Larger scales belong to Spark's round.
    */
  val maxScale = 15

  def round(x: Double, scale: Int, pow: Double): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val a = math.abs(x)
    val y = a * pow
    val f = y - math.floor(y)
    // band: binary/decimal disagreement possible only within a few
    // ulps of a tie; 8 ulps is comfortably past the 0.5-ulp product
    // error. For y ≳ 2^49 the band swallows everything → slow path,
    // which also keeps floor(y + 0.5) inside exact-integer range. An
    // overflowed product (y = ∞ → f = NaN) fails the band comparison,
    // so send it to the slow path explicitly.
    if (java.lang.Double.isInfinite(y) ||
        math.abs(f - 0.5) <= 8 * math.ulp(y))
      return JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP)
        .doubleValue()
    val m = math.floor(y + 0.5)
    if (m == 0.0) return 0.0 // BigDecimal has no -0: round(-1e-300) = +0.0
    val r = m / pow
    if (x < 0) -r else r
  }

  /** `fast_round(x)` → double, decimal HALF_UP at `scale`. */
  case class FastRoundExpr(child: Expression, scale: Int)
      extends UnaryExpression {
    require(scale >= 0 && scale <= maxScale,
      s"scale must be in [0, $maxScale], got $scale")
    private val pow = math.pow(10, scale)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "fast_round"
    override def nullSafeEval(input: Any): Any =
      round(input.asInstanceOf[Double], scale, pow)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"${ev.value} = graft.expr.FastRound.round($x, $scale, ${pow}D);")
    override protected def withNewChildInternal(c: Expression): FastRoundExpr =
      copy(child = c)
  }

  def fast_round(x: Column, scale: Int): Column =
    ColumnBridge.column(FastRoundExpr(ColumnBridge.expression(x), scale))
}
