package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("per-column nulls, distinct, min/max from one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), None),
      (3L, None, Some(30)),
      (4L, Some("a"), Some(10))
    ).toDF("id", "s", "v")
    val got = Profiling.profile(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s")._2 == 1L)       // one null
    assert(got("s")._3 == 2L)       // a, b
    assert(got("s")._4 == "a" && got("s")._5 == "b")
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("entirely-null column reports empty min/max and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val row = Profiling.profile(df, Seq("s")).head()
    assert(row.getLong(2) == 2L)    // n_null
    assert(row.getLong(3) == 0L)    // n_distinct_approx
    assert(row.getString(4) == "" && row.getString(5) == "")
  }

  test("single aggregation: the plan has exactly one final HashAggregate pair") {
    val p = Profiling.profile(graft.Tables.orders(spark, sf0001),
      Seq("o_orderstatus", "o_custkey"))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate over the whole table — the
    // per-column stats must not multiply scans
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(p).size <= 2, p.take(2000))
    assert("FileScan|BatchScan".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("estimate tracks exact distinct within 5% on real data") {
    val orders = graft.Tables.orders(spark, sf0001)
    val approx = Profiling.profile(orders, Seq("o_custkey"))
      .select($"n_distinct_approx").as[Long].head()
    val exact = orders.select(countDistinct($"o_custkey")).as[Long].head()
    assert(math.abs(approx - exact) <= exact * 0.05, s"$approx vs $exact")
  }

  test("contentDigest: identical content digests identically under " +
      "reorder/repartition; any changed row changes the digest") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val a = Profiling.contentDigest(docs, Seq("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val b = Profiling.contentDigest(
        docs.repartition(7).orderBy($"text"), Seq("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
    val mutated = docs.withColumn("text",
      when($"doc_id" === 3, concat($"text", lit("!"))).otherwise($"text"))
    val c = Profiling.contentDigest(mutated, Seq("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    assert(a != c, "a one-char change in one row must change the digest")
  }

  test("contentDigest: even-multiplicity duplicates survive via " +
      "n_rows/sum32 where XOR alone cancels; reference arithmetic") {
    val one = Seq((1L, "x")).toDF("doc_id", "text")
    val twice = Seq((1L, "x"), (1L, "x")).toDF("doc_id", "text")
    val d1 = Profiling.contentDigest(one, Seq("doc_id", "text"),
      nBuckets = 1).head()
    val d2 = Profiling.contentDigest(twice, Seq("doc_id", "text"),
      nBuckets = 1).head()
    assert(d2.getLong(2) == 0L, "xor of an even multiset cancels")
    assert(d1.getLong(1) != d2.getLong(1) &&
      d1.getLong(3) != d2.getLong(3), "count and sum must not cancel")
    // reference: md5("1" + U+0001 + "x")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("1\u0001x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.getLong(2) == java.lang.Long.parseLong(hex.substring(8, 20), 16))
    assert(d1.getLong(3) == java.lang.Long.parseLong(hex.substring(20, 28), 16))
    assert(d1.getLong(1) == 1L)
  }

  test("mergeDigests: digest(A union B) == merge(digest(A), digest(B)) " +
      "— the incremental-append property; one-sided buckets pass " +
      "through") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val cols = Seq("doc_id", "text")
    val whole = Profiling.contentDigest(docs, cols)
      .collect().map(_.toSeq).toSet
    val merged = Profiling.mergeDigests(
        Profiling.contentDigest(a, cols),
        Profiling.contentDigest(b, cols))
      .collect().map(_.toSeq).toSet
    assert(whole == merged)
    // a bucket present only in one side survives the merge intact
    val lone = Profiling.contentDigest(
      Seq((1L, "x")).toDF("doc_id", "text"), cols, nBuckets = 4)
    val empty = lone.filter(lit(false))
    assert(Profiling.mergeDigests(lone, empty)
      .collect().map(_.toSeq).toSet ==
      lone.collect().map(_.toSeq).toSet)
  }

  test("corpusReport: one tall data card — exact counts, planted dup " +
      "rate, language histogram sums to n_docs, Zipf slope present") {
    val prose = "the quick brown fox jumps over the lazy dog and " +
      "keeps running through a field for quite a while longer today"
    val docs = Seq(
      (1L, prose), (2L, prose),                 // exact dup pair
      (3L, "el perro y la casa de los gatos en un campo"),
      (4L, "another plain english document about the data pipeline")
    ).toDF("doc_id", "text")
    val card = Profiling.corpusReport(docs, zipfTopN = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 4.0)
    assert(card("n_unique_texts") == 3.0)
    assert(math.abs(card("exact_dup_rate") - 0.25) < 1e-12)
    val langMass = card.collect {
      case (k, v) if k.startsWith("lang:") => v }.sum
    assert(langMass == 4.0, s"lang histogram mass: $card")
    assert(card("lang:es") == 1.0)
    assert(card.contains("zipf_slope") && card("zipf_slope") < 0.0)
    assert(card("mean_char_entropy") > 3.0 &&
      card("mean_char_entropy") < 5.0) // prose band
    assert(card("mean_quality") >= 0.0 && card("mean_quality") <= 1.0)
  }

  test("skewReport: heavy keys ranked with exact global stats") {
    import spark.implicits._
    // key 0: 60 rows; key 1: 30; keys 2..11: 1 each → 100 rows, 12 keys
    val rows = (Seq.fill(60)(0L) ++ Seq.fill(30)(1L) ++ (2L to 11L))
      .toDF("k")
    val got = Profiling.skewReport(rows, "k", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (-t._2, t._1))
    assert(got.length == 3)
    assert(got(0) == ((0L, 60L, 0.6, 100L, 12L, 60L)))
    assert(got(1) == ((1L, 30L, 0.3, 100L, 12L, 60L)))
    // third row: the (n desc, key asc) tiebreak picks key 2
    assert(got(2)._1 == 2L && got(2)._2 == 1L)
    // p99 over the count distribution [60,30,1×10]: interpolated
    // near the max
    val p99 = Profiling.skewReport(rows, "k", k = 1).collect()(0)
      .getDouble(6)
    assert(p99 > 30.0 && p99 <= 60.0, s"p99=$p99")
  }

  test("fdViolations: a holding dependency returns empty; violations " +
      "rank with global counts; exact distincts (no phantom rows)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),   // key 1: consistent (dup rows)
      (2L, "b", "x"), (2L, "c", "x"),   // key 2: 2 rhs values for col2
      (3L, "d", "x"), (3L, "e", "x"), (3L, "f", "x") // key 3: 3 values
    ).toDF("k", "v", "w")
    // k → w holds (all 'x'): EMPTY result is the "holds" verdict
    assert(Profiling.fdViolations(df, Seq("k"), "w").count() == 0L)
    // k → v breaks on keys 2 and 3
    val got = Profiling.fdViolations(df, Seq("k"), "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(-_._2)
    assert(got.toSeq == Seq(
      (3L, 3L, 3L, 3L, 2L), // 3 rhs values, 3 rows, 3 groups, 2 violating
      (2L, 2L, 2L, 3L, 2L)))
    // k bounds output
    assert(Profiling.fdViolations(df, Seq("k"), "v", k = 1)
      .count() == 1L)
  }
  test("fkAudit: orphans, null keys, and non-unique parents are counted") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk")
    val r = Profiling.fkAudit(child, parent, "fk", "pk", "child->parent")
      .head()
    assert(r.getString(0) == "child->parent")
    assert(r.getLong(1) == 5L)   // child rows
    assert(r.getLong(2) == 1L)   // null keys
    assert(r.getLong(3) == 1L)   // orphan: fk=9
    assert(r.getDouble(4) == 0.25) // 1 / 4 non-null
    assert(r.getLong(5) == 3L)   // distinct parent keys
    assert(r.getLong(6) == 1L)   // pk=2 duplicated
  }

  test("fkAudit: NULL parent keys are not parent keys (unreferencable)") {
    import spark.implicits._
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(Some(1L), Some(2L), None, None).toDF("pk")
    val r = Profiling.fkAudit(child, parent, "fk", "pk", "rel").head()
    assert(r.getLong(5) == 2L, s"NULLs counted as parent keys: $r")
    assert(r.getLong(6) == 0L, s"NULL group counted as dup: $r")
    assert(r.getLong(3) == 0L) // both children resolve
  }

  test("fkAudit: clean relation reports zeros") {
    import spark.implicits._
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profiling.fkAudit(child, parent, "fk", "pk", "ok").head()
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getDouble(4) == 0.0 && r.getLong(6) == 0L)
  }

  test("sampleAudit: proportional sample has chi2 ~ 0; a dropped " +
      "stratum is named; sample-only categories flagged") {
    import spark.implicits._
    val source = (1 to 40).map(i => if (i <= 20) "a" else "b").toDF("g")
    // perfectly proportional half-sample
    val half = (1 to 20).map(i => if (i <= 10) "a" else "b").toDF("g")
    val ok = Profiling.sampleAudit(source, half, "g")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("contrib"))
      .toMap
    assert(ok.values.forall(_ == 0.0), s"$ok")
    // biased: sample only from a — b's contribution is the signal
    val biased = (1 to 20).map(_ => "a").toDF("g")
    val bad = Profiling.sampleAudit(source, biased, "g")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_sample"), r.getAs[Double]("contrib"))).toMap
    assert(bad("b")._1 == 0L && bad("b")._2 == 10.0) // (0-10)^2/10
    assert(bad("a")._2 == 10.0)                      // (20-10)^2/10
    val chi2 = Profiling.sampleAudit(source, biased, "g")
      .head().getAs[Double]("chi2")
    assert(chi2 == 20.0)
    // invented category: expected 0, squared-count contribution
    val invented = Seq("a", "z").toDF("g")
    val inv = Profiling.sampleAudit(source, invented, "g")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("contrib"))
      .toMap
    assert(inv.contains("z") && inv("z") > 0.0)
  }

  test("concentrationReport: uniform load gini ~ 0, monopolized load " +
      "gini -> 1, top-decile share exact") {
    import spark.implicits._
    // group u: 10 users x 10 events each (perfect equality)
    // group m: one user with 91 events, 9 users with 1
    val rows = (0 until 10).flatMap(u => (0 until 10).map(e =>
        ("u", u.toLong))) ++
      (0 until 91).map(_ => ("m", 0L)) ++
      (1 to 9).map(u => ("m", u.toLong))
    val df = rows.toDF("grp", "user")
    val got = Profiling.concentrationReport(df, "grp", "user",
        org.apache.spark.sql.functions.lit(1L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("u")._3 == 0.0, s"$got")
    assert(got("u")._4 == 0.1) // any single user = 10%
    assert(got("m")._3 > 0.7, s"$got")
    assert(got("m")._4 == 0.91) // top-1-of-10 holds 91/100
    assert(got("m")._1 == 10L && got("m")._2 == 100L)
  }

  test("concentrationReport: single-key group reports gini 0") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 1L)).toDF("grp", "user")
    val r = Profiling.concentrationReport(df, "grp", "user",
      org.apache.spark.sql.functions.lit(1L)).head()
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
  }
}
