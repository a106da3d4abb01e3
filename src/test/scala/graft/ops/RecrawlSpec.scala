package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** Recrawl-schedule pins: closed-form change counting ((ts, hash)
  * tiebreak, first observation is never a change), the clamp at both
  * ends, the no-evidence back-off, single-observation behavior, and
  * repartition stability (all integers — exact).
  */
class RecrawlSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("closed forms: mover polls at span/changes, static backs off, " +
      "clamps hold at both ends") {
    val hist = Seq(
      // "fast": changes at every of 4 observations over 3000 s
      ("fast", ts(0), "a"), ("fast", ts(1000), "b"),
      ("fast", ts(2000), "c"), ("fast", ts(3000), "d"),
      // "static": 3 observations, same hash → max interval
      ("static", ts(0), "x"), ("static", ts(5000), "x"),
      ("static", ts(9000), "x"),
      // "once": single observation → no span, max interval
      ("once", ts(100), "y"),
      // "flap": a→b→a counts 2 changes over 2000 s
      ("flap", ts(0), "a"), ("flap", ts(1000), "b"),
      ("flap", ts(2000), "a")
    ).toDF("url", "ts", "content_hash")
    val got = Recrawl.schedule(hist, minIntervalMillis = 500000L,
        maxIntervalMillis = 86400000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // fast: 3 changes / 3_000_000 ms span → raw 1_000_000, above the
    // 500_000 floor → kept; next = 3_000_000 + 1_000_000
    assert(got("fast") == ((4L, 3L, 3000000L, 1000000L, 4000000L)))
    // static: 0 changes → max interval
    assert(got("static") == ((3L, 0L, 9000000L, 86400000L,
      9000000L + 86400000L)))
    assert(got("once") == ((1L, 0L, 0L, 86400000L, 100000L + 86400000L)))
    // flap: 2 changes / 2_000_000 span → 1_000_000
    assert(got("flap") == ((3L, 2L, 2000000L, 1000000L, 3000000L)))

    // floor clamp: a URL changing every second would poll too hot
    val hot = Seq(("h", ts(0), "a"), ("h", ts(1), "b"), ("h", ts(2), "c"))
      .toDF("url", "ts", "content_hash")
    val h = Recrawl.schedule(hot, minIntervalMillis = 500000L,
        maxIntervalMillis = 86400000L).collect()(0)
    assert(h.getLong(4) == 500000L) // clamped UP to the politeness floor
  }

  test("repartition-stable on a synthetic history") {
    val hist = (0 until 500).map { i =>
      (s"u${i % 37}", ts(i * 13), s"h${(i * 7) % 5}")
    }.toDF("url", "ts", "content_hash")
    val a = Recrawl.schedule(hist).collect().map(_.toSeq).toSet
    val b = Recrawl.schedule(hist.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("contentDrift: identical -> 0, rewrite -> 1, tweak in between, " +
      "first version null, cap bounds the comparison") {
    val hist = Seq(
      ("u", ts(0), "hello world this page"),
      ("u", ts(1), "hello world this page"),      // identical: 0.0
      ("u", ts(2), "hello world that page"),      // 2 edits / 21 chars
      ("u", ts(3), "zzzzzzzzzzzzzzzzzzzzz"),      // full rewrite: 1.0
      ("v", ts(5), "only one version")
    ).toDF("url", "ts", "text")
    val got = Recrawl.contentDrift(hist)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(("u", 0L)).isEmpty && got(("v", 5L)).isEmpty)
    assert(got(("u", 1L)).contains(0.0))
    assert(got(("u", 2L)).exists(d => d > 0.05 && d < 0.15), s"$got")
    assert(got(("u", 3L)).contains(1.0))
    // cap: beyond-cap differences are invisible by contract
    val long = Seq(
      ("w", ts(0), "abcde" + "SUFFIX_ONE"),
      ("w", ts(1), "abcde" + "SUFFIX_TWO")
    ).toDF("url", "ts", "text")
    val capped = Recrawl.contentDrift(long, maxChars = 5)
      .collect().flatMap(r => Option(r.get(3))).toSeq
    assert(capped == Seq(0.0), s"capped=$capped")
  }

  test("politenessAudit: gaps per host from the fetch ledger; floor " +
      "violations counted; single-fetch hosts pass vacuously") {
    val fetches = Seq(
      ("a", ts(0)), ("a", ts(10)), ("a", ts(100)),  // gaps 10 s, 90 s
      ("b", ts(0)), ("b", ts(120)),                  // gap 120 s
      ("c", ts(5)))                                  // single fetch
      .toDF("host", "ts")
    val got = Recrawl.politenessAudit(fetches, minGapMillis = 60000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_fetches") == 3 && a.getAs[Long]("n_gaps") == 2)
    assert(a.getAs[Long]("min_gap_ms") == 10000L)
    assert(a.getAs[Double]("mean_gap_ms") == 50000.0)
    assert(a.getAs[Long]("n_violations") == 1 && !a.getAs[Boolean]("ok"))
    val b = got("b")
    assert(b.getAs[Long]("n_violations") == 0 && b.getAs[Boolean]("ok"))
    val c = got("c")
    assert(c.getAs[Long]("n_fetches") == 1 && c.getAs[Long]("n_gaps") == 0)
    assert(c.isNullAt(c.fieldIndex("min_gap_ms")))
    assert(c.isNullAt(c.fieldIndex("mean_gap_ms")))
    assert(c.getAs[Boolean]("ok"))
    // tightening the floor past every gap flags them all
    val strict = Recrawl.politenessAudit(fetches, minGapMillis = 500000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_violations"))
      .toMap
    assert(strict == Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
  }

  test("politenessAudit with endCol: gaps run start-vs-previous-END, " +
      "and OVERLAPPING fetches yield negative gaps that always " +
      "violate the floor") {
    // host a: fetch [0, 30s], next starts at 40s -> gap 10s;
    //         fetch [40s, 45s], next starts at 44s -> gap -1s OVERLAP
    // host b: [0, 5s] then [100s, 101s] -> gap 95s, clean
    val fetches = Seq(
      ("a", ts(0), ts(30)), ("a", ts(40), ts(45)),
      ("a", ts(44), ts(50)),
      ("b", ts(0), ts(5)), ("b", ts(100), ts(101)))
      .toDF("host", "ts", "end_ts")
    val got = Recrawl.politenessAudit(fetches, minGapMillis = 5000L,
        endCol = Some("end_ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_gaps") == 2)
    assert(a.getAs[Long]("min_gap_ms") == -1000L)
    assert(a.getAs[Double]("mean_gap_ms") == 4500.0) // (10000 - 1000)/2
    assert(a.getAs[Long]("n_violations") == 1 && !a.getAs[Boolean]("ok"))
    val b = got("b")
    assert(b.getAs[Long]("min_gap_ms") == 95000L &&
      b.getAs[Boolean]("ok"))
    // same ledger audited start-to-start misses the overlap: the
    // start gaps are 40s and 4s -> the 4s one still violates 5s,
    // but a 10s floor start-to-start would pass where end-aware
    // auditing must fail
    val blind = Recrawl.politenessAudit(fetches, minGapMillis = 3000L)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("n_violations")).toMap
    assert(blind("a") == 0L) // 40s and 4s >= 3s: start-blind passes
  }
}
