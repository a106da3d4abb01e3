package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CompressionSpec extends SparkTestBase {
  import spark.implicits._

  private def ratioOf(s: String): Double =
    Seq(s).toDF("t").select(Compression.compressionRatio($"t").as("r"))
      .as[Double].head()

  test("repetitive text compresses far below natural prose") {
    val natural = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violinists argued about breakfast pastries downtown"
    val repetitive = "spam " * 200
    assert(ratioOf(repetitive) < 0.1)
    assert(ratioOf(natural) > ratioOf(repetitive) * 2)
  }

  test("bounds: empty is 1.0, null propagates, incompressible stays near 1") {
    assert(ratioOf("") == 1.0)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(Compression.compressionRatio($"t")).collect()
    assert(nullRow.head.isNullAt(0))
    // pseudo-random bytes rendered as hex — little redundancy
    val rnd = new scala.util.Random(42)
    val noisy = Array.fill(2000)(rnd.nextInt(16).toHexString).mkString
    val r = ratioOf(noisy)
    assert(r > 0.4 && r <= 1.1, r.toString)
  }

  test("codegen and interpreted paths agree") {
    val texts = Seq("abc abc abc abc", "xyzzy", "", "a b c d e f g")
    val viaDf = texts.toDF("t")
      .select(Compression.compressionRatio($"t")).as[Double].collect().toSeq
    val direct = texts.map(t => CompressionKernels.ratio(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaDf == direct)
  }

  test("registered for SQL via extensions") {
    val r = spark.sql("SELECT compression_ratio('aaaaaaaaaaaaaaaaaaaa') AS r")
      .as[Double].head()
    assert(r < 1.0)
  }

  test("stays inside whole-stage codegen") {
    // codegen stages print as `*(n)` in the simple plan string; an
    // expression falling back to interpreted eval would drop the star
    val p = graft.Tables.documents(spark, sf0001)
      .select(Compression.compressionRatio($"text").as("r"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project") && p.contains("compression_ratio"),
      p.take(1500))
  }
}
