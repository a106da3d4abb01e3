package graft.llmops

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("pseudonymize: joins survive, cardinality preserved, key " +
      "rotation unlinks, nulls stay null") {
    val events = Seq((1L, "click"), (1L, "view"), (2L, "click"))
      .toDF("user_id", "event_type")
    val users = Seq((1L, "a"), (2L, "b")).toDF("user_id", "segment")
    val pe = Privacy.pseudonymize(events, Seq("user_id"), "k1")
    val pu = Privacy.pseudonymize(users, Seq("user_id"), "k1")
    // same key → same pseudonym → the join still works
    val joined = pe.join(pu, Seq("user_id"))
    assert(joined.count() == 3)
    assert(pe.select("user_id").distinct().count() == 2)
    // pseudonyms are not the original ids
    assert(pe.filter($"user_id".isin("1", "2")).count() == 0)
    // a rotated key unlinks: zero pseudonym overlap
    val rotated = Privacy.pseudonymize(events, Seq("user_id"), "k2")
    assert(pe.select("user_id").intersect(
      rotated.select("user_id")).count() == 0)
    // null ids stay null (not a hash of the string "null")
    val withNull = Seq((Some(1L), "x"), (None, "y"))
      .toDF("user_id", "event_type")
    val pn = Privacy.pseudonymize(withNull, Seq("user_id"), "k1")
    assert(pn.filter($"user_id".isNull).count() == 1)
  }

  test("kAnonymityAudit: class landscape counted exactly") {
    // classes: (a, x) size 3, (a, y) size 1, (b, x) size 2
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("q1", "q2")
    val r = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), k = 3).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(r.getAs[Long]("violating_classes") == 2L) // sizes 1 and 2
    assert(r.getAs[Long]("violating_rows") == 3L)
    assert(r.getAs[Double]("violating_row_rate") == 0.5)
    // fully anonymous at k=2 except the singleton
    val r2 = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), k = 2).head()
    assert(r2.getAs[Long]("violating_rows") == 1L)
  }

  test("lDiversityAudit: the homogeneity attack is counted — a big " +
      "class with one sensitive value violates; NULL is a value") {
    // class (a): 4 rows but ONE sensitive value -> violates l=2
    // class (b): 2 rows, two values -> ok
    // class (c): 2 rows, value + NULL -> NULL counts, ok at l=2
    val df = Seq(
      ("a", Some("flu")), ("a", Some("flu")), ("a", Some("flu")),
      ("a", Some("flu")),
      ("b", Some("flu")), ("b", Some("cold")),
      ("c", Some("flu")), ("c", None)).toDF("q1", "s")
    val r = Privacy.lDiversityAudit(df, Seq("q1"), "s", l = 2).head()
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_distinct_sensitive") == 1L)
    assert(r.getAs[Long]("violating_classes") == 1L)
    assert(r.getAs[Long]("violating_rows") == 4L)
    assert(r.getAs[Double]("violating_row_rate") == 0.5)
    // guards
    intercept[IllegalArgumentException] {
      Privacy.lDiversityAudit(df, Seq("s"), "s", l = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityAudit(df, Seq("q1"), "s", l = 1)
    }
  }
}
