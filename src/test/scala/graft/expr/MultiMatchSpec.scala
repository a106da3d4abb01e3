package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultiMatchSpec extends SparkTestBase {
  import spark.implicits._

  private val classic = Seq("he", "she", "his", "hers")

  test("contains_any / matched_terms: the classic AC fixture — " +
      "suffix-sharing patterns, overlaps, failure-link matches") {
    val rows = Seq(
      (1L, "ushers"),        // matches she (via fail), he, hers
      (2L, "this"),          // his
      (3L, "ahead"),         // he
      (4L, "xyz"),           // nothing
      (5L, "")               // empty text
    ).toDF("id", "text")
    val got = rows.select($"id",
        MultiMatch.contains_any($"text", classic).as("hit"),
        MultiMatch.matched_terms($"text", classic).as("terms"))
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        r.getSeq[String](2).toList)).toSeq
    assert(got == Seq(
      (1L, true, List("he", "she", "hers")),
      (2L, true, List("his")),
      (3L, true, List("he")),
      (4L, false, Nil),
      (5L, false, Nil)), s"got=$got")
  }

  test("differential: contains_any over real documents equals the " +
      "per-pattern contains() chain; codegen path exercised") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // real word fragments so both branches fire
    val pats = Seq("the", "err", "zz", "data", "qua")
    val naive = pats.map(p => contains($"text", lit(p)))
      .reduce(_ || _)
    val diff = docs.select(
        MultiMatch.contains_any($"text", pats).as("ac"),
        naive.as("nv"))
      .filter($"ac" =!= $"nv").count()
    assert(diff == 0L)
    // matched_terms agrees with the per-pattern decomposition
    val row = docs.limit(50).select($"text",
        MultiMatch.matched_terms($"text", pats).as("m")).collect()
    row.foreach { r =>
      val t = r.getString(0)
      val exp = pats.filter(t.contains(_))
      assert(r.getSeq[String](1).toList == exp, s"on: ${t.take(40)}")
    }
  }

  test("null text yields null, not a crash; single-char patterns; " +
      "pattern-at-boundary") {
    val rows = Seq((1L, Some("abc")), (2L, None))
      .toDF("id", "text")
    val got = rows.select(
        MultiMatch.contains_any($"text", Seq("c", "ab")).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSeq == Seq(Some(true), None))
    intercept[IllegalArgumentException] {
      MultiMatch.contains_any(lit("x"), Seq.empty)
    }
    // non-string input fails at ANALYSIS, not mid-job
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("id")
        .select(MultiMatch.contains_any($"id", Seq("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"), err.getMessage)
  }

  test("redact_any: leftmost-longest — hers beats he; committed spans " +
      "never overlap; adjacency is fine; text without matches is " +
      "untouched") {
    val rows = Seq(
      (1L, "ushers"),          // "she"[1,4) commits first; "hers"
                               // starts inside it -> skipped
      (2L, "hers"),            // start 0: longest is "hers", not "he"
      (3L, "heshe"),           // [0,2)="he", then [2,5)="she"
      (4L, "clean text"),
      (5L, "hehe")             // two adjacent commits
    ).toDF("id", "text")
    val got = rows.select($"id",
        MultiMatch.redact_any($"text", classic, mask = "#").as("r"))
      .orderBy($"id").select($"r").as[String].collect().toSeq
    assert(got == Seq("u#rs", "#", "##", "clean text", "##"),
      s"got=$got")
    // a mask that itself contains a pattern is NOT rescanned
    val again = Seq(Tuple1("he"))
      .toDF("text")
      .select(MultiMatch.redact_any($"text", classic, "he-he"))
      .as[String].head()
    assert(again == "he-he")
  }

  test("codegen binds the automaton per OPERATOR INIT, not per row: " +
      "the plan ships a slim AcRef (never the built Ac — per-task " +
      "multi-MB deserialization — and never a raw pattern Seq — " +
      "per-row O(|patterns|) hashCode, the r9 verdict's defect)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    val pats = (1 to 50).map(i => s"phrase$i")
    for (e <- Seq(
        MultiMatch.ContainsAny(Literal("x"), pats),
        MultiMatch.MatchedTerms(Literal("x"), pats),
        MultiMatch.RedactAny(Literal("x"), pats, "#"))) {
      val ctx = new CodegenContext
      e.genCode(ctx)
      assert(ctx.references.exists(_.isInstanceOf[MultiMatch.AcRef]),
        s"${e.prettyName}: generated code must reference the AcRef")
      assert(!ctx.references.exists(_.isInstanceOf[MultiMatch.Ac]),
        s"${e.prettyName}: the BUILT automaton must not serialize " +
          "into task binaries")
      assert(!ctx.references.exists(_.isInstanceOf[Seq[_]]),
        s"${e.prettyName}: generated code must NOT carry the raw " +
          "pattern Seq (per-row automaton(patterns) lookup)")
      // the resolve is hoisted into operator init (a mutable-state
      // field assigned from acRef.get), not inlined per row
      assert(ctx.declareMutableStates().contains("MultiMatch.Ac") &&
          ctx.initMutableStates().contains(".get()"),
        s"${e.prettyName}: resolved Ac must live in operator init " +
          "state")
    }
  }
}
