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

  test("cohenKappa: empty input reports zero items and null " +
      "statistics, not a DIVIDE_BY_ZERO task failure (ANSI mode)") {
    val got = Labeling.cohenKappa(
      Seq.empty[(String, String)].toDF("ra", "rb"), "ra", "rb").head()
    assert(got.getLong(0) == 0L && got.getDouble(1) == 0.0)
    assert(got.isNullAt(2) && got.isNullAt(3))
  }

  test("weightedKappa: quadratic vs linear closed forms on a 3-point " +
      "scale; near-misses cost less than blunders") {
    // (1,1)x2 (2,2) (3,3) agree; (1,3) blunder; (1,2) near-miss; n=6
    val rows = Seq((1, 1), (1, 1), (2, 2), (3, 3), (1, 3), (1, 2))
      .toDF("ra", "rb")
    val q = Labeling.weightedKappa(rows, "ra", "rb").head()
    // span 2; quad: d_o = (1 + 0.25)/6; d_e = 13.5/36
    assert(q.getLong(0) == 6L)
    assert(q.getDouble(1) == 0.2083 && q.getDouble(2) == 0.375)
    assert(q.getDouble(3) == 0.4445) // 1 - 0.2083/0.375, 4dp chain
    val l = Labeling.weightedKappa(rows, "ra", "rb", "linear").head()
    // linear: d_o = (1 + 0.5)/6 = 0.25; d_e = 17/36
    assert(l.getDouble(1) == 0.25 && l.getDouble(2) == 0.4722)
    assert(l.getDouble(3) == 0.4706)
    // zero span (one shared value): d_e = 0, kappa undefined
    val one = Seq((2, 2), (2, 2)).toDF("ra", "rb")
    assert(Labeling.weightedKappa(one, "ra", "rb").head().isNullAt(3))
    // empty input: null stats, no ANSI divide-by-zero
    val empty = Labeling.weightedKappa(
      Seq.empty[(Int, Int)].toDF("ra", "rb"), "ra", "rb").head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(3))
    intercept[IllegalArgumentException] {
      Labeling.weightedKappa(rows, "ra", "rb", "cubic")
    }
  }

  test("fleissKappa: two-rater panel closed form (= Scott's pi); " +
      "off-panel items dropped and counted") {
    // items {a,a} {a,b} {b,b}: P_bar = 2/3, P_e = 0.5, kappa = 1/3
    val rows = Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b",
      3L -> "b", 3L -> "b")
    val got = Labeling.fleissKappa(rows.toDF("item", "label"),
      "item", "label", raters = 2).head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 0L)
    assert(got.getDouble(2) == 0.6667 && got.getDouble(3) == 0.5)
    assert(got.getDouble(4) == 0.3334) // from the rounded pair
    // a 1-rating and a 3-rating item are both off-panel: dropped,
    // counted, and absent from the pooled label distribution
    val noisy = rows ++ Seq(9L -> "a", 8L -> "a", 8L -> "a", 8L -> "a")
    val g2 = Labeling.fleissKappa(noisy.toDF("item", "label"),
      "item", "label", raters = 2).head()
    assert(g2.getLong(0) == 3L && g2.getLong(1) == 2L)
    assert(g2.getDouble(2) == 0.6667 && g2.getDouble(3) == 0.5)
    // perfect panel agreement: kappa 1
    val perfect = Seq(1L -> "a", 1L -> "a", 2L -> "b", 2L -> "b")
    assert(Labeling.fleissKappa(perfect.toDF("item", "label"),
      "item", "label", 2).head().getDouble(4) == 1.0)
    // single shared label: P_e = 1, kappa undefined
    val one = Seq(1L -> "a", 1L -> "a").toDF("item", "label")
    assert(Labeling.fleissKappa(one, "item", "label", 2).head()
      .isNullAt(4))
    // empty: zero kept, zero dropped, null stats
    val empty = Labeling.fleissKappa(
      Seq.empty[(Long, String)].toDF("item", "label"),
      "item", "label", 2).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.isNullAt(4))
    intercept[IllegalArgumentException] {
      Labeling.fleissKappa(one, "item", "label", 1)
    }
  }

  test("gwetAC1: survives the prevalence paradox where kappa goes " +
      "negative; single category undefined; empty input null") {
    // 8 ok/ok + (ok,bad) + (bad,ok): po = 0.8 but kappa < 0
    val skew = (Seq.fill(8)(("ok", "ok")) ++
      Seq(("ok", "bad"), ("bad", "ok"))).toDF("ra", "rb")
    val k = Labeling.cohenKappa(skew, "ra", "rb").head()
    assert(k.getDouble(3) == -0.1111, k.toString) // the paradox
    val g = Labeling.gwetAC1(skew, "ra", "rb").head()
    assert(g.getLong(0) == 10L && g.getDouble(1) == 0.8)
    // pi_ok = 0.9, pi_bad = 0.1 -> gamma_e = 0.18
    assert(g.getDouble(2) == 0.18)
    assert(g.getDouble(3) == 0.7561) // (0.8 - 0.18)/0.82
    // one shared category: k = 1, gamma_e and AC1 undefined
    val one = Seq(("ok", "ok"), ("ok", "ok")).toDF("ra", "rb")
    val g1 = Labeling.gwetAC1(one, "ra", "rb").head()
    assert(g1.isNullAt(2) && g1.isNullAt(3))
    // empty input
    val empty = Labeling.gwetAC1(
      Seq.empty[(String, String)].toDF("ra", "rb"), "ra", "rb").head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(3))
  }

  test("krippendorffAlphaOrdinal: closed forms against a reference " +
      "implementation — skipping a popular middle category costs " +
      "more; singleton units dropped") {
    def alpha(rows: Seq[(Long, Int)]): org.apache.spark.sql.Row =
      Labeling.krippendorffAlphaOrdinal(rows.toDF("item", "label"),
        "item", "label").head()
    // perfect agreement: D_o = 0
    val perfect = alpha(Seq(1L -> 1, 1L -> 1, 2L -> 3, 2L -> 3))
    assert(perfect.getLong(0) == 4L && perfect.getDouble(1) == 0.0)
    assert(perfect.getDouble(2) == 2.6667 &&
      perfect.getDouble(3) == 1.0)
    // the nominal textbook chance case stays 0 under ordinal too
    val chance = alpha(Seq(1L -> 1, 1L -> 1, 2L -> 1, 2L -> 2))
    assert(chance.getDouble(1) == 2.0 && chance.getDouble(2) == 2.0)
    assert(chance.getDouble(3) == 0.0)
    // adjacent-step disagreements {1,2} and {2,3}: ordinal alpha
    // 0.25 where nominal alpha on the same data is -0.2
    val near = alpha(Seq(1L -> 1, 1L -> 2, 2L -> 2, 2L -> 3))
    assert(near.getDouble(1) == 2.25 && near.getDouble(2) == 3.0)
    assert(near.getDouble(3) == 0.25)
    val nominal = Labeling.krippendorffAlpha(
      Seq(1L -> "1", 1L -> "2", 2L -> "2", 2L -> "3")
        .toDF("item", "label"), "item", "label").head()
    assert(nominal.getDouble(3) == -0.2)
    // mixed panel with an unpairable singleton dropped
    val mixed = alpha(Seq(1L -> 1, 1L -> 1, 2L -> 2, 2L -> 3,
      3L -> 3, 3L -> 3, 9L -> 2))
    assert(mixed.getLong(0) == 6L)
    assert(mixed.getDouble(1) == 1.3333 && mixed.getDouble(2) == 6.0)
    assert(mixed.getDouble(3) == 0.7778)
    // zero variance and empty input: undefined alpha
    assert(alpha(Seq(1L -> 2, 1L -> 2, 2L -> 2, 2L -> 2)).isNullAt(3))
    val empty = alpha(Seq.empty[(Long, Int)])
    assert(empty.getLong(0) == 0L && empty.isNullAt(3))
  }

  test("consensusLabels: majority wins, ties break toward the " +
      "larger label deterministically, support is the vote share") {
    val votes = Seq(
      1L -> "a", 1L -> "a", 1L -> "b",       // majority a, 2/3
      2L -> "x", 2L -> "y",                  // tie -> y (larger)
      3L -> "solo")                          // unanimous singleton
      .toDF("item", "label")
    val got = Labeling.consensusLabels(votes, "item", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toMap
    assert(got(1L) == (("a", 2L, 3L, 0.6667)))
    assert(got(2L) == (("y", 1L, 2L, 0.5)))
    assert(got(3L) == (("solo", 1L, 1L, 1.0)))
  }

  test("raterOutliers: the rater who diverges from the majority is " +
      "flagged below -zThresh; zero-variance panels flag no one") {
    // raters a/b/c agree on all 10 items; d disagrees on 6 ->
    // rates {1,1,1,0.4}: mean 0.85, sd_pop ~0.2598, z_d = -sqrt(3)
    val rows = (0L until 10L).flatMap { i =>
      Seq((i, "a", "ok"), (i, "b", "ok"), (i, "c", "ok"),
        (i, "d", if (i < 6) "bad" else "ok"))
    }.toDF("item", "rater", "label")
    val got = Labeling.raterOutliers(rows, "item", "rater", "label",
        zThresh = 1.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("d").getAs[Double]("agree_rate") == 0.4)
    assert(got("a").getAs[Double]("agree_rate") == 1.0)
    assert(got("d").getAs[Double]("z") < -1.5 &&
      got("d").getAs[Boolean]("outlier"))
    assert(!got("a").getAs[Boolean]("outlier") &&
      got("a").getAs[Double]("z") > 0)
    // unanimous panel: sd = 0, z null, no outliers
    val same = (0L until 4L).flatMap(i =>
      Seq((i, "a", "ok"), (i, "b", "ok")))
      .toDF("item", "rater", "label")
    val s = Labeling.raterOutliers(same, "item", "rater", "label")
      .collect()
    assert(s.forall(r => r.isNullAt(r.fieldIndex("z")) &&
      !r.getAs[Boolean]("outlier")))
  }

  test("krippendorffAlphaInterval: near-misses on a numeric scale " +
      "are mostly agreement; nominal calls them pure disagreement") {
    def alpha(rows: Seq[(Long, Double)]): org.apache.spark.sql.Row =
      Labeling.krippendorffAlphaInterval(rows.toDF("item", "value"),
        "item", "value").head()
    // perfect agreement
    val perfect = alpha(Seq(1L -> 1.0, 1L -> 1.0, 2L -> 2.0, 2L -> 2.0))
    assert(perfect.getLong(0) == 4L && perfect.getDouble(3) == 1.0)
    // the nominal textbook chance case maps to interval 0 too:
    // {1,1} and {1,2} -> D_o = D_e = 0.5
    val chance = alpha(Seq(1L -> 1.0, 1L -> 1.0, 2L -> 1.0, 2L -> 2.0))
    assert(chance.getDouble(1) == 0.5 && chance.getDouble(2) == 0.5)
    assert(chance.getDouble(3) == 0.0)
    // units {1,2} and {4,5}: every unit disagrees by 1 on a wide
    // scale -> interval alpha 0.85; nominal alpha on the same data
    // is 0 (four distinct labels, every unit split)
    val near = alpha(Seq(1L -> 1.0, 1L -> 2.0, 2L -> 4.0, 2L -> 5.0))
    assert(near.getDouble(1) == 1.0)
    assert(near.getDouble(2) == 6.6667 && near.getDouble(3) == 0.85)
    val nominal = Labeling.krippendorffAlpha(
      Seq(1L -> "1", 1L -> "2", 2L -> "4", 2L -> "5")
        .toDF("item", "label"), "item", "label").head()
    assert(nominal.getDouble(3) == 0.0)
    // unpairable singleton dropped; zero-variance D_e undefined
    val single = alpha(Seq(1L -> 3.0, 1L -> 3.0, 9L -> 7.0))
    assert(single.getLong(0) == 2L && single.isNullAt(3))
    val empty = alpha(Seq.empty[(Long, Double)])
    assert(empty.getLong(0) == 0L && empty.isNullAt(3))
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
