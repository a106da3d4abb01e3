package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join") {
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select($"k", $"lv", $"rv")
      .collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", saltBuckets = 4)
      .select($"k", $"lv", $"rv").collect().toSet
    assert(salted == plain)
  }

  test("salted left join preserves unmatched rows") {
    val left = Seq((1, "a"), (9, "z")).toDF("k", "lv")
    val right = Seq((1, "X")).toDF("k", "rv")
    val got = Skew.saltedJoin(left, right, "k", 4, "left")
      .select($"k", $"lv", $"rv").collect().toSet
    assert(got.map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))) ==
      Set((1, "a", Some("X")), (9, "z", None)))
  }
}
