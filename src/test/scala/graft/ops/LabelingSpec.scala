package graft.ops

import graft.SparkTestBase

class LabelingSpec extends SparkTestBase {
  import spark.implicits._

  test("cohenKappa: closed-form confusion table; unlabeled rows " +
      "excluded; perfect agreement scores 1") {
    // 10 a/a + 4 b/b + 3 a/b + 3 b/a: po = 0.7, marginals 13/7 both
    // sides, pe = (13*13 + 7*7)/400 = 0.545, kappa = 0.155/0.455
    val rows =
      Seq.fill(10)(("a", "a")) ++ Seq.fill(4)(("b", "b")) ++
        Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "a"))
    val df = rows.toDF("ra", "rb")
    val got = Labeling.cohenKappa(df, "ra", "rb").head()
    assert(got.getLong(0) == 20L)
    assert(got.getDouble(1) == 0.7)
    assert(got.getDouble(2) == 0.545)
    assert(got.getDouble(3) == 0.3407)
    // null labels on either side are excluded, not scored
    val withNulls = df.unionByName(Seq(
      ("a", null.asInstanceOf[String]),
      (null.asInstanceOf[String], "b")).toDF("ra", "rb"))
    assert(Labeling.cohenKappa(withNulls, "ra", "rb").head()
      .getLong(0) == 20L)
    // perfect agreement over 2+ labels: kappa 1
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("ra", "rb")
    assert(Labeling.cohenKappa(perfect, "ra", "rb").head()
      .getDouble(3) == 1.0)
  }

  test("cohenKappa: a single shared label makes chance total " +
      "(pe = 1) and kappa undefined (null)") {
    val one = Seq(("ok", "ok"), ("ok", "ok")).toDF("ra", "rb")
    val got = Labeling.cohenKappa(one, "ra", "rb").head()
    assert(got.getDouble(1) == 1.0 && got.getDouble(2) == 1.0)
    assert(got.isNullAt(3))
  }

  test("krippendorffAlpha: closed forms — perfect 1, chance-level 0, " +
      "systematic disagreement -0.5; unpairable units dropped") {
    def alpha(rows: Seq[(Long, String)]): org.apache.spark.sql.Row =
      Labeling.krippendorffAlpha(rows.toDF("item", "label"),
        "item", "label").head()
    // perfect agreement across two units
    val perfect = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b"))
    assert(perfect.getDouble(3) == 1.0 && perfect.getLong(0) == 4L)
    // the textbook chance case: {a,a} and {a,b} -> D_o = D_e = 0.5
    val chance = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b"))
    assert(chance.getDouble(1) == 0.5 && chance.getDouble(2) == 0.5)
    assert(chance.getDouble(3) == 0.0)
    // systematic disagreement: every unit split a/b
    val sys = alpha(Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b"))
    assert(sys.getDouble(3) == -0.5, sys.toString)
    // a single-label unit is unpairable: dropping it changes nothing
    val withSingleton = alpha(Seq(1L -> "a", 1L -> "a", 2L -> "a",
      2L -> "b", 9L -> "a"))
    assert(withSingleton.getLong(0) == 4L &&
      withSingleton.getDouble(3) == 0.0)
  }

  test("krippendorffAlpha: one shared category makes D_e = 0 and " +
      "alpha undefined; empty input reports zero pairable") {
    val one = Seq(1L -> "ok", 1L -> "ok", 2L -> "ok", 2L -> "ok")
      .toDF("item", "label")
    val got = Labeling.krippendorffAlpha(one, "item", "label").head()
    assert(got.getDouble(1) == 0.0 && got.getDouble(2) == 0.0)
    assert(got.isNullAt(3))
    val empty = Labeling.krippendorffAlpha(
      Seq.empty[(Long, String)].toDF("item", "label"),
      "item", "label").head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(3))
  }
}
