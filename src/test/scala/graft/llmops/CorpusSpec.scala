package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val goodText = ("the quick brown fox jumps over a lazy dog and " +
    "keeps running through the field for quite a while longer").trim

  test("stages compose: gate, redact, exact dedup, decontaminate") {
    val docs = Seq(
      (1L, goodText),                            // survives
      (2L, goodText),                            // exact dup of 1 → dropped
      (3L, "x"),                                 // fails quality gate
      (4L, s"contact bob@example.com about $goodText today"), // PII, survives redacted
      (5L, s"$goodText benchmark copy")          // exact benchmark match → dropped
    ).toDF("doc_id", "text")
    // benchmark carries the PII-free text doc 5 will redact to
    val bench = Seq(s"$goodText benchmark copy").toDF("text")

    val out = Corpus.clean(docs, benchmark = Some(bench), minQuality = 0.5)
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    val redacted = out.filter($"doc_id" === 4L)
      .select($"text").as[String].head()
    assert(redacted.contains("<EMAIL>") && !redacted.contains("bob@"))
  }

  test("PII-bearing benchmark doc still decontaminates (same normalization)") {
    val piiText = s"reach alice@example.org regarding $goodText"
    val docs = Seq((1L, piiText), (2L, goodText)).toDF("doc_id", "text")
    val bench = Seq(piiText).toDF("text")
    val kept = Corpus.clean(docs, benchmark = Some(bench), minQuality = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("blocklist gate case-folds both sides by default: a MIXED-CASE " +
      "planted phrase drops against a lowercase blocklist; the " +
      "case-sensitive mode keeps it") {
    val docs = Seq(
      (1L, goodText),
      (2L, s"$goodText and then Buy ViAgRa now they said"), // mixed case
      (3L, s"$goodText plus buy viagra cheap"),             // lower case
      (4L, s"$goodText mentioning viagrafoo too")           // substring hits
    ).toDF("doc_id", "text")
    val folded = Corpus.clean(docs, minQuality = 0.0, redact = false,
        blocklist = Some(Seq("buy viagra")))
      .select($"doc_id").as[Long].collect().toSet
    assert(folded == Set(1L, 4L), s"got=$folded")
    val strict = Corpus.clean(docs, minQuality = 0.0, redact = false,
        blocklist = Some(Seq("buy viagra")), blocklistCaseFold = false)
      .select($"doc_id").as[Long].collect().toSet
    // the mixed-case variant silently survives — exactly the foot-gun
    // the default guards against
    assert(strict == Set(1L, 2L, 4L), s"got=$strict")
  }

  test("near-dup cluster stage keeps one representative per cluster") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),       // near-dup of 1
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
      nearDupThreshold = Some(0.7))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("compression gate drops templated docs, keeps prose") {
    val docs = Seq(
      (1L, goodText),
      (2L, "spam " * 120)    // deflate ratio well under 0.2
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
      minCompressionRatio = 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("language filter keeps only the requested language") {
    val en = "the cat and the dog sat in a quiet corner of the house that day"
    val de = "der hund und die katze sind von dem haus mit den kindern gegangen"
    val docs = Seq((1L, en), (2L, de)).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, lang = Some("en"))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("LM-perplexity gate drops gibberish, passes short and normal docs") {
    val ref = (0L until 10L).map(i => (i, goodText)).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(ref, $"text")
    val bi = LangModel.bigramCounts(ref, $"text")
    val docs = Seq(
      (1L, goodText),                  // low self-perplexity
      (2L, "zq xv qp wk jx vz pq kx"), // gibberish under the reference LM
      (3L, goodText + " indeed")       // normal doc, distinct from 1
    ).toDF("doc_id", "text")
    // tiny reference vocab: the unseen floor ln(V) ~ 2.9, so the
    // threshold sits between seen-bigram prose (~0.6) and the floor
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
        lmTables = Some((uni, bi)), maxNll = 2.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("classifier gate composes: trained weights filter low-prob docs") {
    val train = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, goodText + " extra clean prose", 1)
      else (i, "spam junk buy now click banner offer", 0)
    }.toDF("doc_id", "text", "label")
    val (w, b) = QualityModel.train(train, epochs = 10, lr = 4.0)
    val docs = Seq(
      (1L, goodText + " extra clean prose"),
      (2L, "spam junk buy now click banner offer")
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
        qualityModel = Some((w, b)), minModelProb = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("span-removal stage strips shared boilerplate before dedup") {
    val boiler = "all rights reserved worldwide inc"
    val docs = Seq(
      (1L, s"$goodText $boiler"),
      (2L, s"completely different text body here that is long enough to pass quality $boiler")
    ).toDF("doc_id", "text")
    val out = Corpus.clean(docs, minQuality = 0.0, redact = false,
      dropSpanNgram = Some(5))
    val texts = out.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts.size == 2)
    assert(!texts(1L).contains("rights reserved") &&
      !texts(2L).contains("rights reserved"))
  }

  test("DSIR gate composes: importance floor drops off-target docs, " +
    "batch matches the streaming gate semantics") {
    val target = Seq((100L, s"$goodText $goodText")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, goodText + " fox dog field"),
      (2L, "entirely unrelated spam junk words repeated spam junk words " +
        "that stretch long enough to pass the quality floor easily today"))
      .toDF("doc_id", "text")
    val (m, dflt) = Dsir.ratioMap(Dsir.logRatios(target, docs))
    val scores = docs.select($"doc_id",
        Dsir.logwColumn($"text", m, dflt).as("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(1L) > scores(2L))
    val floor = (scores(1L) + scores(2L)) / 2
    val out = Corpus.clean(docs, minQuality = 0.0, redact = false,
      dsir = Some((m, dflt, floor)))
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("nearDupThreshold = 0.4 plans a split that catches a mid-similarity " +
    "pair the historical fixed (16, 8) split misses") {
    // Planted pair at char-5-shingle Jaccard ≈ 0.48: a shared prefix
    // with distinct tails (J ≈ p/(p + 2t)). The fixed (16, 8) split's
    // S-curve midpoint sits at ≈ 0.71, so at s ≈ 0.48 its band-collision
    // probability is ~4% — the pair never reaches the verify stage.
    // LshPlan.plan(0.4) = (32, 4) puts the midpoint at ≈ 0.38 and the
    // collision probability at ~0.8. Both outcomes are deterministic
    // here: the sketch kernel's hash functions are fixed.
    val prefix = "the annual shareholder letter describes revenue growth " +
      "across every operating segment of the business this fiscal year"
    val tailA = " while margin pressure persisted in the retail arm overall"
    val tailB = " and the board also approved a dividend increase this week"
    val docs = Seq(
      (1L, prefix + tailA),
      (2L, prefix + tailB),
      (3L, "an entirely unrelated filler document about logistics and " +
        "warehouse throughput optimization during the busy season"))
      .toDF("doc_id", "text")

    // sanity: the planted pair really sits in the mid-similarity band —
    // well under the fixed split's ~0.71 operating point, above 0.4
    val sim = docs.filter($"doc_id" <= 2).select(
        Sketches.minhash_signature($"text", 5, 128).as("sig"))
      .as[Array[Long]].collect() match {
        case Array(a, b) => a.zip(b).count(p => p._1 == p._2) / 128.0
      }
    assert(sim > 0.4 && sim < 0.6, s"planted pair sim=$sim out of band")

    // the historical fixed split: no candidate, hence no pair
    val fixed = Dedup.minhashPairs(docs, threshold = 0.4,
        bands = 16, rowsPerBand = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!fixed.contains((1L, 2L)),
      "the fixed (16, 8) split should miss the mid-similarity pair " +
        "(if this ever fires, re-tune the planted tails)")

    // the planned split (auto-derived from the threshold): pair found
    val planned = Dedup.minhashPairs(docs, threshold = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(planned.contains((1L, 2L)), s"planned split missed the pair: $planned")

    // end-to-end: clean(nearDupThreshold = 0.4) drops the higher id
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
        nearDupThreshold = Some(0.4))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept=$kept")
  }

  test("nearDupKeepBest keeps the cluster's higher-quality member " +
      "where min-id dedup keeps the scrape") {
    val prefix = "the annual shareholder letter describes revenue growth " +
      "across every operating segment of the business this fiscal year"
    // doc 1: the ad-littered scrape — same content, punctuation junk
    // pushes its punct ratio past the 0.1 quality component
    val tailLow = " !!! ??? ;;; ::: !!! ??? ;;; ::: !!! ??? ;;; ::: !!"
    val tailHigh = " and the board also approved a dividend increase " +
      "this week"
    val docs = Seq(
      (1L, prefix + tailLow),
      (2L, prefix + tailHigh),
      (3L, "an entirely unrelated filler document about logistics and " +
        "warehouse throughput optimization during the busy season"))
      .toDF("doc_id", "text")
    // sanity: the quality gap and the near-dup pair both exist
    val qs = docs.select($"doc_id",
        TextFuncs.qualityScore($"text").as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(qs(2L) > qs(1L), s"quality fixture broken: $qs")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted pair not found: $pairs")
    // min-id dedup keeps the scrape (doc 1); keepBest keeps the clean
    // original (doc 2) — same survivor count, better survivors
    val minId = Corpus.clean(docs, minQuality = 0.0, redact = false,
        nearDupThreshold = Some(0.4))
      .select($"doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 3L), s"min-id kept=$minId")
    val best = Corpus.clean(docs, minQuality = 0.0, redact = false,
        nearDupThreshold = Some(0.4), nearDupKeepBest = true)
      .select($"doc_id").as[Long].collect().toSet
    assert(best == Set(2L, 3L), s"keepBest kept=$best")
  }

  test("maxDupLineFrac gate drops listing-shaped docs, keeps prose") {
    val listing = (1 to 10).map(_ => "item row repeated").mkString("\n")
    val docs = Seq((1L, goodText), (2L, listing)).toDF("doc_id", "text")
    val kept = Corpus.clean(docs, minQuality = 0.0, redact = false,
        maxDupLineFrac = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // default 1.0 gates nothing
    assert(Corpus.clean(docs, minQuality = 0.0, redact = false)
      .count() == 2)
  }

  test("line-boilerplate stage composes: shared footer lines drop, " +
      "bodies survive, then exact dedup sees clean text") {
    // footer is in all 3 docs (>= minDocs=3 -> dropped); the shared
    // BODY line is in only 2 docs (< 3 -> survives), so docs 1 and 3
    // become exact dups after line removal and collapse in dedup
    val docs = Seq(
      (1L, goodText + "\nCOPYRIGHT FOOTER LINE"),
      (2L, "a different body of reasonable length that reads like prose " +
        "for the quality gate\nCOPYRIGHT FOOTER LINE"),
      (3L, goodText + "\nCOPYRIGHT FOOTER LINE")
    ).toDF("doc_id", "text")
    val out = Corpus.clean(docs, minQuality = 0.0, redact = false,
        dropLineBoilerplateMinDocs = Some(3))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L), s"kept=${out.keySet}")
    assert(out(1L) == goodText) // footer gone
    assert(!out(2L).contains("COPYRIGHT"))
  }

  test("normalizeUnicode preserves line structure so the line stages " +
      "still see lines") {
    val comb = "é"
    val docs = Seq(
      (1L, s"caf$comb body one\nNAV FOOTER\nmore"),
      (2L, s"café body two\nNAV FOOTER\nother"),
      (3L, s"café body three\nNAV FOOTER\nlast"))
      .toDF("doc_id", "text")
    val out = Corpus.clean(docs, minQuality = 0.0, redact = false,
        normalizeUnicode = true, dropLineBoilerplateMinDocs = Some(3))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // the shared NAV line dropped (lines survived normalization);
    // spelling canonicalized; per-doc lines intact and ordered
    assert(out(1L) == "café body one\nmore", s"got ${out(1L)}")
    assert(!out(2L).contains("NAV"))
  }

  test("normalizeUnicode stage: byte-spelling variants collapse in " +
      "exact dedup; default keeps both") {
    // same rendered text, NFC vs combining-mark spelling, plus
    // whitespace noise clean_text scrubs
    val pre = goodText + " caf\u00E9"
    val comb = goodText + "  cafe\u0301 "
    val docs = Seq((1L, pre), (2L, comb)).toDF("doc_id", "text")

    val raw = Corpus.clean(docs, minQuality = 0.0, redact = false)
      .select($"doc_id").as[Long].collect().toSet
    assert(raw == Set(1L, 2L)) // distinct bytes -> both survive

    val norm = Corpus.clean(docs, minQuality = 0.0, redact = false,
        normalizeUnicode = true)
    assert(norm.select($"doc_id").as[Long].collect().toSet == Set(1L))
    // the surviving text is the canonical spelling
    assert(norm.select($"text").as[String].head() == pre)
  }

  test("periodic re-clean recipe: landed table -> re-clean -> snapshot " +
      "diff surfaces the retroactive rewrites streaming cannot make") {
    // The X97 line-boilerplate stage is batch-only BY DESIGN: a line
    // only becomes boilerplate after minDocs documents carry it, so a
    // streaming gate would need to rewrite ALREADY-LANDED documents.
    // The honest posture (SCALING.md's runnable recipe) is: land the
    // stream, re-clean the landed table periodically, and let the
    // snapshot diff say exactly which documents the new evidence
    // rewrote.
    val dir = java.nio.file.Files.createTempDirectory("graft-reclean")
    dir.toFile.deleteOnExit()
    val landed = dir.resolve("landed").toString
    val body1 = "unique content of the first landed document"
    val body2 = "entirely different content in the second arrival"
    val footer = "SIGN UP FOR OUR NEWSLETTER"

    // micro-batch 1 lands; its footer line is UNIQUE so far
    Seq((1L, s"$body1\n$footer")).toDF("doc_id", "text")
      .write.mode("append").parquet(landed)
    val cleanV1 = TextFuncs.dropBoilerplateLines(
      spark.read.parquet(landed), minDocs = 2)
    // nothing crosses minDocs yet: doc 1 keeps its footer
    assert(cleanV1.select($"text").as[String].head()
      == s"$body1\n$footer")
    val snapV1 = dir.resolve("clean_v1").toString
    cleanV1.write.parquet(snapV1)

    // micro-batch 2 lands the SAME footer under a new doc — the line
    // is now corpus-boilerplate, including inside already-landed doc 1
    Seq((2L, s"$body2\n$footer")).toDF("doc_id", "text")
      .write.mode("append").parquet(landed)
    val cleanV2 = TextFuncs.dropBoilerplateLines(
      spark.read.parquet(landed), minDocs = 2)
    val snapV2 = dir.resolve("clean_v2").toString
    cleanV2.write.parquet(snapV2)

    val byDoc = spark.read.parquet(snapV2)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(byDoc(1L) == body1, "re-clean must rewrite the LANDED doc")
    assert(byDoc(2L) == body2)

    // the snapshot diff names the retroactive rewrite: doc 1 CHANGED
    // (its footer vanished under new evidence), doc 2 is ADDED
    val statuses = graft.ops.SnapshotDiff.diff(
        spark.read.parquet(snapV1), spark.read.parquet(snapV2))
      .as[(Long, String)].collect().toMap
    assert(statuses == Map(1L -> "changed", 2L -> "added"),
      s"statuses=$statuses")
  }
}
