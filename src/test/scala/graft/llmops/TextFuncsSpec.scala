package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class TextFuncsSpec extends SparkTestBase {
  import spark.implicits._

  test("token counting") {
    val df = Seq("one two  three", "", "   ", "single").toDF("t")
    val got = df.select(TextFuncs.tokenCount($"t").as("n")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("approx BPE token count: ceil(len/4) per word") {
    val df = Seq("abcd efghijkl x").toDF("t") // 1 + 2 + 1
    assert(df.select(TextFuncs.approxBpeTokenCount($"t")).as[Long].head() == 4L)
  }

  test("langId picks the stopword-dominant language; und when none") {
    val df = Seq(
      "the cat and the dog in a house",          // en
      "el perro y la casa de los gatos",         // es
      "der hund und die katze ist von den",      // de
      "xyzzy qwerty plugh")                      // und
      .toDF("t")
    val got = df.select(TextFuncs.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("script-aware tokens: unspaced CJK isolates one token per ideograph") {
    val zh = "这的数据很好"       // unspaced zh
    val mixed = "Spark データ pipeline"       // latin + katakana
    val df = Seq(zh, mixed, "plain ascii text").toDF("t")
    val got = df.select(TextFuncs.tokens($"t").as("k"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) ==
      Seq("这", "的", "数", "据", "很", "好"))
    assert(got(1) == Seq("spark", "デ", "ー", "タ", "pipeline"))
    assert(got(2) == Seq("plain", "ascii", "text"))
  }

  test("langId detects zh on REAL unspaced Chinese text") {
    // stopwords 的/是 occur EMBEDDED in unspaced text — a pure
    // whitespace tokenizer never isolates them, so this input used to
    // fall to "und" (the r9 verdict's top defect)
    val df = Seq(
      "这的数据是好的", // zh, zero spaces
      "the data is good and the tests pass").toDF("t")
    val got = df.select(TextFuncs.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == Seq("zh", "en"))
  }

  test("quality score stays in [0,1] over the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val mm = docs.select(TextFuncs.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("word n-grams and jaccard") {
    val df = Seq(("a b c d", "a b c e")).toDF("x", "y")
    val j = df.select(TextFuncs.ngramJaccard($"x", $"y", 2).as("j")).as[Double].head()
    // grams x: {a b, b c, c d}, y: {a b, b c, c e} → 2/4
    assert(math.abs(j - 0.5) < 1e-9)
  }

  test("charShingles distinct and sized") {
    val df = Seq("aaaaa").toDF("t")
    val got = df.select(TextFuncs.charShingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(got == Seq("aaa"))
  }

  test("PII redaction replaces emails, phones, and IPs with typed tags") {
    val df = Seq(
      "mail bob.smith+x@corp.example.co or call 555-0142 from 10.1.2.3",
      "no pii here").toDF("t")
    val got = df.select(TextFuncs.redactPii($"t").as("r")).as[String].collect().toSeq
    assert(got.head == "mail <EMAIL> or call <PHONE> from <IP>")
    assert(got(1) == "no pii here")
    val counts = df.select(
      TextFuncs.emailCount($"t").as("e"),
      TextFuncs.phoneCount($"t").as("p"),
      TextFuncs.ipCount($"t").as("i")).as[(Int, Int, Int)].collect().toSeq
    assert(counts == Seq((1, 1, 1), (0, 0, 0)))
  }

  test("PII redaction is case-insensitive on raw (non-lowercased) text") {
    val df = Seq("reach Bob@Example.COM or ADMIN@CORP.IO today").toDF("t")
    val r = df.select(TextFuncs.redactPii($"t")).as[String].head()
    assert(r == "reach <EMAIL> or <EMAIL> today")
    val n = df.select(TextFuncs.emailCount($"t")).as[Int].head()
    assert(n == 2)
  }

  test("phone pattern needs word boundaries; partial numbers survive") {
    val df = Seq("id 1555-01421 stays, 555-0142 goes").toDF("t")
    val r = df.select(TextFuncs.redactPii($"t")).as[String].head()
    assert(r == "id 1555-01421 stays, <PHONE> goes")
  }

  test("duplicate word/ngram fractions") {
    val df = Seq("a b a b a", "a b c d e", "").toDF("t")
    val got = df.select(
      TextFuncs.duplicateWordFraction($"t").as("dw"),
      TextFuncs.duplicateNgramFraction($"t", 2).as("d2"))
      .as[(Double, Double)].collect().toSeq
    // "a b a b a": 5 words, 2 distinct → dw 0.6; 2-grams {a b, b a, a b,
    // b a} → 4 grams, 2 distinct → 0.5
    assert(math.abs(got.head._1 - 0.6) < 1e-9)
    assert(math.abs(got.head._2 - 0.5) < 1e-9)
    assert(got(1) == ((0.0, 0.0)))
    assert(got(2) == ((0.0, 0.0)))
  }

  test("word-ngram kernel is element-identical to the HOF formulation") {
    // edge inputs where trim/split semantics bite: Spark trim strips
    // only spaces, split keeps leading/trailing empties from \n \t
    val edges = Seq("", "   ", "a", "a b", "\nleading newline", "tab\tsep",
      "trailing newline\n", "a  double  space", "MiXeD Case Tokens",
      "exactly three tokens", "héllo wörld ünïcode tokens here")
    val corpus = graft.Tables.documents(spark, sf0001).limit(200)
      .select($"text").as[String].collect().toSeq
    for (n <- Seq(2, 3, 8); t <- edges ++ corpus) {
      val df = Seq(t).toDF("t")
      val fast = df.select(TextFuncs.wordNgrams($"t", n)).head().getSeq[String](0)
      val hof = df.select(TextFuncs.wordNgramsHof($"t", n)).head().getSeq[String](0)
      assert(fast == hof, s"n=$n text=${t.take(40).replace("\n", "\\n")}")
    }
  }

  test("repetitionStats: positional Gopher rules in integer token space") {
    val docs = Seq(
      (1L, "a b a b c"),   // top "a b"=2; dup occ at 2 positions; cover {a,b,a,b}=4
      (2L, "x y z"),       // no repetition
      (3L, "w"),           // < n tokens: excluded
      (4L, "t t t t"),     // "t t" x3; every position dup; cover 4
      (5L, "a b a b a")    // overlap: 4 dup occ, cover 5 (unioned, not 8)
    ).toDF("doc_id", "text")
    val got = TextFuncs.repetitionStats(docs, n = 2)
      .orderBy($"doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5, 2L, 2L, 4L),
      (2L, 3, 1L, 0L, 0L),
      (4L, 4, 3L, 3L, 4L),
      (5L, 5, 2L, 4L, 5L)))
    // minCount above every within-doc frequency: dup stats go to zero
    val strict = TextFuncs.repetitionStats(docs, n = 2, minCount = 4)
      .orderBy($"doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(strict.forall { case (_, _, _, dgo, dtc) => dgo == 0L && dtc == 0L })
  }

  test("line-shape signals: duplicate-line and terminal-punct fractions") {
    import spark.implicits._
    val rows = Seq(
      // 4 non-blank lines, one repeat, two end in punctuation
      (1L, "First sentence.\nmenu\nmenu\nIs that all?"),
      (2L, "no lines just prose"), // 1 line, no punct end
      (3L, ""),                    // no non-blank lines -> 0.0 / 0.0
      (4L, "A!\n\n  \nB\"\nC'")    // blanks skipped; ! " ' all terminal
    ).toDF("doc_id", "text")
    val got = rows.select($"doc_id",
        TextFuncs.duplicateLineFraction($"text").as("d"),
        TextFuncs.terminalPunctLineFraction($"text").as("p"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((0.25, 0.5)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 1.0)))
  }

  test("dropBoilerplateLines: corpus-wide lines drop, unique lines keep " +
      "their order, blanks are structure") {
    import spark.implicits._
    val docs = Seq(
      (1L, "NAV\nalpha body one\n\nbeta body one\nFOOTER 2026"),
      (2L, "NAV\ngamma body two\nFOOTER 2026"),
      (3L, "NAV\nalpha body one\nalpha body one\ndelta three\nFOOTER 2026"))
      .toDF("doc_id", "text")
    val out = TextFuncs.dropBoilerplateLines(docs, minDocs = 2)
      .as[(Long, String)].collect().toMap
    // NAV and FOOTER appear in all 3 docs -> dropped everywhere;
    // "alpha body one" appears in docs 1 and 3 -> dropped too (minDocs=2)
    assert(out(1L) == "\nbeta body one")
    assert(out(2L) == "gamma body two")
    assert(out(3L) == "delta three")

    // minDocs=3: the 2-doc line survives, within-doc repeat intact
    val loose = TextFuncs.dropBoilerplateLines(docs, minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(loose(1L) == "alpha body one\n\nbeta body one")
    assert(loose(3L) == "alpha body one\nalpha body one\ndelta three")

    // blank lines shared by every doc are never counted as boilerplate
    val blanky = Seq((1L, "a\n\nx"), (2L, "b\n\ny")).toDF("doc_id", "text")
    val kept = TextFuncs.dropBoilerplateLines(blanky, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(kept(1L) == "a\n\nx" && kept(2L) == "b\n\ny")

    // an all-boilerplate doc returns empty text, not a dropped row
    val allBoiler = Seq((1L, "SAME"), (2L, "SAME"), (3L, "SAME\nreal"))
      .toDF("doc_id", "text")
    val emptied = TextFuncs.dropBoilerplateLines(allBoiler, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(emptied.keySet == Set(1L, 2L, 3L))
    assert(emptied(1L) == "" && emptied(3L) == "real")

    // extra columns ride through untouched
    val wide = Seq((1L, "en", "NAV\nx"), (2L, "de", "NAV\ny"))
      .toDF("doc_id", "lang", "text")
    val w = TextFuncs.dropBoilerplateLines(wide, minDocs = 2)
    assert(w.columns.toSeq == Seq("doc_id", "lang", "text"))
    assert(w.filter($"doc_id" === 2L).select($"lang", $"text")
      .as[(String, String)].head() == (("de", "y")))
  }

  test("lineLangSegments: code-mixed doc splits into ordered " +
      "monolingual runs; consecutive same-language lines merge") {
    val doc = Seq((1L,
      "the cat sat on the mat and that is that\n" +
      "el que la de y los en un\n" +
      "la de el que y un en los\n" +
      "der und die das von ist mit den\n" +
      "the dog and the fox in a box")).toDF("doc_id", "text")
    val segs = TextFuncs.lineLangSegments(doc).orderBy($"seg_idx")
      .select($"seg_idx", $"lang", $"n_lines")
      .as[(Int, String, Long)].collect().toSeq
    assert(segs == Seq((1, "en", 1L), (2, "es", 2L), (3, "de", 1L),
      (4, "en", 1L)), s"segs=$segs")
    // the two-line Spanish run reassembles in order with its newline
    val es = TextFuncs.lineLangSegments(doc).filter($"lang" === "es")
      .select($"seg_text").as[String].head()
    assert(es == "el que la de y los en un\nla de el que y un en los")
  }

  test("lineLangSegments: single-language doc is one segment equal " +
      "to its text; blank lines are und boundaries; repartition-" +
      "stable") {
    val one = Seq((1L, "the cat and the dog in a box"))
      .toDF("doc_id", "text")
    val s1 = TextFuncs.lineLangSegments(one).collect()
    assert(s1.length == 1)
    assert(s1(0).getString(2) == "en")
    assert(s1(0).getString(4) == "the cat and the dog in a box")
    val blanky = Seq((2L, "the cat and that\n\nthe dog is in a box"))
      .toDF("doc_id", "text")
    val langs = TextFuncs.lineLangSegments(blanky).orderBy($"seg_idx")
      .select($"lang").as[String].collect().toSeq
    assert(langs == Seq("en", "und", "en"), s"langs=$langs")
    val docs = Seq(
      (1L, "the cat and that\nel que la de y\nthe dog in a box"),
      (2L, "der und die das\nthe fox is in that box"))
      .toDF("doc_id", "text")
    val a = TextFuncs.lineLangSegments(docs).collect()
      .map(_.toSeq).toSet
    val b = TextFuncs.lineLangSegments(docs.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }

  test("clusterTerms: cluster-specific vocabulary dominates, " +
      "everywhere-terms score zero, tf breaks within-cluster order") {
    val docs = Seq(
      ("a", "common alpha alpha beta"),
      ("a", "common alpha"),
      ("b", "common gamma gamma gamma delta"),
      ("c", "common epsilon")
    ).toDF("src", "text")
    val got = TextFuncs.clusterTerms(docs, "src", k = 2)
      .orderBy($"cluster", $"rk")
      .select($"cluster", $"rk", $"term", $"tf")
      .as[(String, Int, String, Long)].collect().toSeq
    // "common" appears in all 3 clusters -> ln(3/3) = 0: it can only
    // fill a slot when a cluster runs out of distinguishing terms
    // (cluster c), and never outranks one
    assert(!got.exists(t => t._3 == "common" && t._2 == 1), s"got=$got")
    assert(got.filter(_._1 == "a").map(_._3) == Seq("alpha", "beta"))
    assert(got.filter(_._1 == "b").map(_._3) == Seq("gamma", "delta"))
    assert(got.filter(_._1 == "c").map(_._3) ==
      Seq("epsilon", "common"))
    val zero = TextFuncs.clusterTerms(docs, "src", k = 2)
      .filter($"term" === "common").select($"score").as[Double].head()
    assert(zero == 0.0)
    // exact score: alpha tf=3, in 1 of 3 clusters -> 3 * ln(3)
    val sc = TextFuncs.clusterTerms(docs, "src", k = 2)
      .filter($"term" === "alpha").select($"score").as[Double].head()
    assert(math.abs(sc - 3.0 * math.log(3.0)) < 1e-12, s"sc=$sc")
  }

  test("pmiPairs: a systematic collocation scores above independent " +
      "co-occurrence; pair keys are unordered; minCount floors") {
    // "neural nets" always adjacent (10x); "the" is everywhere
    val docs = (0 until 10).map(i =>
      (i.toLong, s"the neural nets filler$i the stuff$i the end$i"))
      .toDF("doc_id", "text")
    val got = TextFuncs.pmiPairs(docs, topV = 50, window = 2,
        minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val nn = got(("nets", "neural")) // least/greatest key order
    assert(nn._1 == 10L)
    // "the"-"neural" co-occurs 10x too, but "the" appears 30x:
    // its PMI must be strictly lower than the exclusive pair
    val tn = got(("neural", "the"))
    assert(nn._2 > tn._2, s"nn=$nn tn=$tn")
    // minCount: nothing with fewer than 5 co-occurrences survives
    assert(got.values.forall(_._1 >= 5L))
  }

  test("charEntropy: closed forms — 0 for one repeated char, 1 bit for " +
      "two alternating, 2 bits for four distinct; empty text emits " +
      "no row") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextFuncs.charEntropy(docs)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_chars", $"char_entropy")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L)) // doc 4 absent
    assert(got.map(_._2) == Seq(4L, 4L, 4L))
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(got(0)._3, 0.0) && close(got(1)._3, 1.0) &&
      close(got(2)._3, 2.0), s"got=$got")
  }

  test("pmiPairs: the pair mass P normalizes over UNFILTERED counts — " +
      "a reported pair's PMI is invariant to the minCount floor") {
    val docs = (0 until 10).map(i =>
      (i.toLong, s"the neural nets filler$i the stuff$i the end$i"))
      .toDF("doc_id", "text")
    def pmiOf(minCount: Int): Double =
      TextFuncs.pmiPairs(docs, topV = 50, window = 2,
          minCount = minCount)
        .filter($"term_a" === "nets" && $"term_b" === "neural")
        .select($"pmi").as[Double].head()
    // under a post-filter P the denominator (and so every PMI) would
    // shift as minCount changes
    assert(math.abs(pmiOf(5) - pmiOf(10)) < 1e-12)
  }

  test("pmiPairs: repartition-stable and vocabulary-pruned") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = TextFuncs.pmiPairs(docs, topV = 30, window = 2,
      minCount = 10).collect().map(_.toSeq).toSet
    val b = TextFuncs.pmiPairs(docs.repartition(7), topV = 30,
      window = 2, minCount = 10).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
    // every surviving term is in the top-30 vocabulary
    assert(a.flatMap(r => Seq(r(0), r(1))).size <= 60)
  }

  test("zipfFit: an exact power law fits with r2 = 1 and the planted " +
      "slope; a flat distribution fits slope 0") {
    // freq(rank) = round(1000 * rank^-1): plant word w_r exactly
    // freq times -> slope near -1, r2 near 1
    val rows = (1 to 20).flatMap { r =>
      val f = math.max(1, math.round(1000.0 * math.pow(r, -1.0)).toInt)
      Seq.fill(f)(s"w${"%02d".format(r)}")
    }
    val docs = Seq(rows.mkString(" ")).toDF("text")
    val fit = TextFuncs.zipfFit(docs, topN = 20)
      .select($"n_points", $"slope", $"r2")
      .as[(Long, Double, Double)].head()
    assert(fit._1 == 20L)
    assert(math.abs(fit._2 + 1.0) < 0.01, s"slope=${fit._2}")
    assert(fit._3 > 0.9999, s"r2=${fit._3}")
    // flat: every word equally frequent -> slope 0 exactly
    val flat = Seq((1 to 10).flatMap(i => Seq.fill(7)(s"t$i"))
      .mkString(" ")).toDF("text")
    val f2 = TextFuncs.zipfFit(flat, topN = 10)
      .select($"slope").as[Double].head()
    assert(f2 == 0.0, s"flat slope=$f2")
  }

  test("encoding-damage signals: exact counts on planted damage, " +
      "zero on clean prose, tab/newline exempt from the control class") {
    val rows = Seq(
      // 0: clean prose — every counter 0
      "The quick brown fox jumps over the lazy dog.",
      // 1: mojibake: Ã© Ã¤ â€ (from â€œ) = 3; plus Â+NBSP = 4
      "cafÃ© Ã¤ â€œquoteÂ x",
      // 2: two replacement chars
      "lost � bytes � here",
      // 3: controls: , ,  count; \t \n \r do not
      "abcd\te\nf\rg",
      // 4: empty
      "")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = rows.select($"id",
        TextFuncs.replacementCharCount($"text").as("r"),
        TextFuncs.controlCharCount($"text").as("c"),
        TextFuncs.mojibakeCount($"text").as("m"),
        TextFuncs.encodingDamageRatio($"text").as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((0, 0, 0, 0.0)))
    assert(got(1L)._1 == 0 && got(1L)._2 == 0 && got(1L)._3 == 4)
    assert(got(2L) == ((2, 0, 0, 2.0 / 19)))
    assert(got(3L) == ((0, 3, 0, 3.0 / 13)))
    assert(got(4L) == ((0, 0, 0, 0.0))) // empty → 0, not null/NaN
  }

  test("sourceDivergence: concentrated source diverges more than a " +
      "corpus-shaped one; zero cells stay finite; repartition-stable") {
    // source "u": 90 docs uniform over w0..w9 (dominates the corpus
    // mix); source "k": 10 docs of only w0 (misses the other 9
    // corpus-common words — the zero cells carry its divergence)
    val uDocs = Seq.fill(90)((0 until 10).map(i => s"w$i").mkString(" "))
    val kDocs = Seq.fill(10)("w0 w0 w0 w0 w0 w0 w0 w0 w0 w0")
    val docs = (uDocs.map(("u", _)) ++ kDocs.map(("k", _)))
      .toDF("source", "text")
    val got = TextFuncs.sourceDivergence(docs, topV = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("u")._1 == 900L && got("k")._1 == 100L)
    assert(!got("k")._2.isNaN && !got("k")._2.isInfinite)
    assert(got("k")._2 > got("u")._2 + 0.5,
      s"k=${got("k")._2} u=${got("u")._2}")
    // closed form, both sources: vocab = all 10 words; n_w(w0)=190,
    // others 90; nc=1000, V=10
    val q0 = 191.0 / 1010
    val qO = 91.0 / 1010
    val pU = 91.0 / 910
    val klU = pU * math.log(pU / q0) + 9 * pU * math.log(pU / qO)
    assert(math.abs(got("u")._2 - klU) < 1e-9, s"got ${got("u")._2} want $klU")
    val pK0 = 101.0 / 110
    val pKo = 1.0 / 110
    val klK = pK0 * math.log(pK0 / q0) + 9 * pKo * math.log(pKo / qO)
    assert(math.abs(got("k")._2 - klK) < 1e-9, s"got ${got("k")._2} want $klK")

    val again = TextFuncs.sourceDivergence(docs.repartition(7), topV = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(again("u") - got("u")._2) < 1e-9)
    assert(math.abs(again("k") - got("k")._2) < 1e-9)
  }

  test("readability: closed-form words/sentences/syllables/Flesch; " +
      "no-vowel words floor at one syllable; empty text → null") {
    val rows = Seq(
      (0L, "The cat sat."), // 3 words, 1 sentence, 3 syllables
      (1L, "tv hmm"),       // no vowel runs: 2 words → 2 syllables
      (2L, ""))
      .toDF("id", "text")
    val got = rows.select($"id",
        TextFuncs.tokenCount($"text").as("w"),
        TextFuncs.sentenceCountApprox($"text").as("s"),
        TextFuncs.syllableCountApprox($"text").as("y"),
        TextFuncs.fleschReadingEase($"text").as("f"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got(0L)._1 == 3 && got(0L)._2 == 1 && got(0L)._3 == 3)
    assert(math.abs(got(0L)._4.get -
      (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-9)
    assert(got(1L) == ((2, 1, 2,
      Some(206.835 - 1.015 * 2 - 84.6 * 1))))
    assert(got(2L)._1 == 0 && got(2L)._4.isEmpty)
  }

  test("truncateTokens: under-budget passes bit-identical (weird " +
      "whitespace included); over-budget keeps head+tail with marker") {
    val rows = Seq(
      (0L, "short  doc   with   odd spacing"), // 5 tokens, ≤ 3+2: verbatim
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 > 5: truncated
      (2L, ""))
      .toDF("id", "text")
    val got = rows.select($"id",
        TextFuncs.truncateTokens($"text", 3, 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // verbatim means the double spaces survive
    assert(got(0L) == "short  doc   with   odd spacing")
    assert(got(1L) == "w1 w2 w3 ... w9 w10")
    assert(got(2L) == "")
  }

  test("distinctiveTerms: a group-exclusive supported term outranks a " +
      "shared one; minCount gates one-off noise") {
    import spark.implicits._
    val docs = Seq(
      ("a", "quantum quantum quantum shared shared"),
      ("a", "quantum quantum shared noise"),
      ("b", "pottery pottery pottery shared shared"),
      ("b", "pottery pottery shared")
    ).toDF("source", "text")
    val got = TextFuncs.distinctiveTerms(docs, "source", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(5)))
    val aTop = got.filter(_._1 == "a").minBy(_._2)
    val bTop = got.filter(_._1 == "b").minBy(_._2)
    assert(aTop._3 == "quantum" && bTop._3 == "pottery", s"${got.toSeq}")
    assert(aTop._4 > 0.0 && bTop._4 > 0.0)
    // "shared" is balanced: never the top term, z near zero
    val sharedZ = got.filter(_._3 == "shared").map(_._4)
    sharedZ.foreach(z => assert(math.abs(z) < aTop._4))
    // "noise" (count 1) is gated by minCount = 2
    assert(!got.exists(_._3 == "noise"))
  }

  test("redactCards: Luhn-valid cards redacted (spaced and dashed " +
      "too), random digit runs and short runs untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "pay with 4111111111111111 now"),            // valid visa
      (2L, "pay with 4111 1111 1111 1111 now"),         // valid, spaced
      (3L, "card 5500-0055-5555-5559 on file"),         // valid, dashed
      (4L, "order 4111111111111112 confirmed"),         // fails Luhn
      (5L, "call 555-0123 ref 12345678 ok"),            // too short
      (6L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select($"id",
        TextFuncs.redactCards($"t").as("r"),
        coalesce(size(TextFuncs.cardCandidates($"t")), lit(-1)).as("nc"),
        coalesce(size(TextFuncs.validCards($"t")), lit(-1)).as("nv"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ((Some("pay with <CARD> now"), 1, 1)))
    assert(got(2L) == ((Some("pay with <CARD> now"), 1, 1)))
    assert(got(3L) == ((Some("card <CARD> on file"), 1, 1)))
    assert(got(4L) == ((Some("order 4111111111111112 confirmed"), 1, 0)))
    assert(got(5L)._1 == Some("call 555-0123 ref 12345678 ok"))
    assert(got(5L)._3 == 0)
    assert(got(6L)._1.isEmpty)
    // word-bounded replacement: a valid card's digit sequence INSIDE
    // a longer digit run was never a candidate and must not be
    // rewritten, even when the same text also holds a real occurrence
    val embedded = Seq(Tuple1(
      "id 94111111111111111123 card 4111111111111111 end")).toDF("t")
      .select(TextFuncs.redactCards($"t")).head().getString(0)
    assert(embedded == "id 94111111111111111123 card <CARD> end",
      embedded)
    // the checksum itself, directly
    val luhn = Seq(("4111111111111111", true),
      ("4111111111111112", false), ("5500005555555559", true))
    luhn.foreach { case (s, expect) =>
      val v = Seq(Tuple1(s)).toDF("d")
        .select(TextFuncs.luhnValid($"d")).head().getBoolean(0)
      assert(v == expect, s"$s")
    }
  }

  test("dehyphenate repairs letter-hyphen-newline-letter wraps only; " +
      "unwrapLines joins single breaks and keeps paragraphs") {
    import spark.implicits._
    val df = Seq(
      (1L, "an exam-\nple of a hyphen-\n  ated word"),
      (2L, "keep 3-\n4 and x -\ny untouched"),   // digit / space-hyphen
      (3L, "one line\ntwo line\n\nnew paragraph"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select($"id",
        TextFuncs.dehyphenate($"t").as("d"),
        TextFuncs.unwrapLines($"t").as("u"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(got(1L)._1 == Some("an example of a hyphenated word"))
    assert(got(2L)._1 == Some("keep 3-\n4 and x -\ny untouched"))
    assert(got(3L)._2 == Some("one line two line\n\nnew paragraph"))
    assert(got(4L) == ((None, None)))
    // round trip: planting wraps into clean prose then repairing
    // restores it (the q236 contract)
    val clean = "the processing layer considers vector streams merged"
    val wrapped = clean.replace("er", "-\ner")
    val back = Seq(Tuple1(wrapped)).toDF("t")
      .select(TextFuncs.dehyphenate($"t")).head().getString(0)
    assert(back == clean, s"got: $back")
  }
}
