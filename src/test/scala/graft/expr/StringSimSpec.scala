package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StringSimSpec extends SparkTestBase {
  import spark.implicits._

  test("jaroWinkler matches the DuckDB convention table (the q243 " +
      "oracle runs jaro_winkler_similarity verbatim)") {
    // values probed from duckdb jaro_winkler_similarity — the oracle
    // contract this kernel must reproduce at 6dp
    val table = Seq(
      ("martha", "marhta", 0.961111),
      ("dixon", "dicksonx", 0.813333),
      ("jellyfish", "smellyfish", 0.896296), // no common prefix: = jaro
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "abc", 0.0),
      ("", "", 0.0), // duckdb convention: empty-empty is 0
      ("dwayne", "duane", 0.84),
      ("TRATE", "TRACE", 0.906667),
      ("a", "ab", 0.85),
      ("prefix", "prefixxxxx", 0.92), // prefix bonus capped at l=4
      // boost threshold: jaro <= 0.7 gets NO prefix bonus
      ("abcdef", "azzzzzzzzzz", 0.419192),
      ("abcd", "abzzzzzzzzzzzz", 0.547619),
      // odd mismatch count (3-cycle): transpositions FLOOR to t div 2
      ("abcdexxxx", "cabdexxxx", 0.962963),
      // non-ASCII: the comparison unit is the UTF-8 BYTE, exactly as
      // DuckDB iterates — accented Latin, Thai, CJK all probed
      ("café", "cafe", 0.848333),
      ("naïve", "naive", 0.857778),
      ("สวัสดี", "สวีสดั", 0.955556),
      ("grüße", "grusse", 0.642857),
      ("Müller", "Mueller", 0.828571),
      ("日本語テスト", "日本語てスト", 0.930556))
    table.foreach { case (a, b, want) =>
      val got = StringSim.jaroWinkler(a, b)
      assert(math.abs(got - want) < 5e-7, s"($a, $b): $got vs $want")
      // symmetry
      assert(math.abs(StringSim.jaroWinkler(b, a) - want) < 5e-7)
    }
  }

  test("jaro_winkler column runs through codegen; null propagates") {
    val df = Seq(("martha", "marhta"), ("abc", null))
      .toDF("a", "b")
    val got = df.select(round(StringSim.jaro_winkler($"a", $"b"), 4))
      .collect()
    assert(got(0).getDouble(0) == 0.9611)
    assert(got(1).isNullAt(0))
  }
}
