package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FastRoundSpec extends SparkTestBase {
  import spark.implicits._

  private def diff(xs: Seq[Double], scale: Int): Seq[(Double, Double, Double)] =
    xs.toDF("x")
      .select($"x", round($"x", scale).as("spark"),
        FastRound.fast_round($"x", scale).as("fast"))
      .as[(Double, Double, Double)].collect().toSeq
      .filter { case (_, s, f) =>
        java.lang.Double.doubleToRawLongBits(s) !=
          java.lang.Double.doubleToRawLongBits(f) &&
          !(s.isNaN && f.isNaN)
      }

  test("matches Spark round on specials, ties and sign edges") {
    val edges = Seq(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      1e-300, -1e-300, 4.9e-324,
      // decimal-tie shaped inputs (the double nearest x.xxxxxx5 sits
      // a hair off the true tie — exactly the band the guard covers)
      1.0000005, -1.0000005, 2.5e-7, -2.5e-7, 0.0000005, -0.0000005,
      0.1234565, 12.3456785, 123456.1234565,
      // values whose scaled product is ulp-close to an integer
      1.0 - 1e-16, 1.0 + 1e-16, 0.9999994999999999,
      // large magnitudes (band swallows the fast path)
      1e9 + 0.1234565, -1e9 - 0.1234565, 1e15, -1e15, 4.5e9, 7.3e13,
      8.988465674311579e307, -8.988465674311579e307)
    for (scale <- Seq(0, 2, 6, 15)) {
      val bad = diff(edges, scale)
      assert(bad.isEmpty, s"scale=$scale mismatches: ${bad.take(5)}")
    }
  }

  test("matches Spark round on fuzzed doubles across magnitudes") {
    val r = new scala.util.Random(42)
    val xs = Seq.tabulate(200000) { i =>
      val mag = math.pow(10, (i % 25) - 12) // 1e-12 .. 1e12
      (r.nextDouble() - 0.5) * mag
    } ++ Seq.fill(50000)(
      // dense near-tie fuzz at score scale: k/1e6 + tiny jitter
      (r.nextInt(4000001) - 2000000 + 0.5) / 1e6 +
        (r.nextDouble() - 0.5) * 1e-12)
    val bad = diff(xs, 6)
    assert(bad.isEmpty, s"${bad.size} mismatches, first: ${bad.take(5)}")
  }

  test("rejects out-of-range scales") {
    intercept[IllegalArgumentException] {
      FastRound.FastRoundExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(lit(1.0)), 16)
    }
  }
}
