package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call batch corpus cleaning: the composed path a training-data
  * user actually runs, assembling the llmops stages in the order that
  * is right at scale:
  *
  *  0. unicode normalization     — (optional) NFC + control/whitespace
  *                                 scrub FIRST, so every heuristic,
  *                                 model, and digest downstream sees
  *                                 one canonical spelling per text —
  *                                 two byte spellings of the same
  *                                 rendered doc must not survive exact
  *                                 dedup as distinct;
  *  1. quality / language gate   — narrow, cheapest, runs first so
  *                                 every later stage sees fewer rows;
  *                                 includes the optional Aho-Corasick
  *                                 blocklist gate (case-folded on both
  *                                 sides by default — MultiMatch itself
  *                                 is case-sensitive);
  *  1b. model gates (optional)   — LM perplexity ≤ maxNll and/or
  *                                 classifier prob ≥ minModelProb:
  *                                 join-shaped, so they run after the
  *                                 narrow heuristics and before
  *                                 anything rewrites text (models
  *                                 score what they were trained on);
  *  2. PII redaction             — before ANY digesting, so no dedup
  *                                 or decontamination state ever holds
  *                                 raw PII, and exact matching is in
  *                                 one normalization everywhere;
  *  2b. line/span removal (opt.) — cross-document boilerplate LINES
  *                                 (nav, footers — whole-line key),
  *                                 then duplicated n-gram spans; both
  *                                 after redaction (they rewrite text)
  *                                 and before any digesting, so
  *                                 boilerplate never pollutes dedup
  *                                 signatures;
  *  3. content-hash sampling     — stateless, deterministic, before
  *                                 dedup so dropped docs never pay the
  *                                 digest shuffle;
  *  4. exact dedup               — identical payloads collapse via the
  *                                 16-byte digest shuffle before the
  *                                 (pricier) sketch stage sees them;
  *  5. near-dup cluster dedup    — MinHash/LSH pairs → connected
  *                                 components → one representative per
  *                                 cluster (the batch-only stage: a
  *                                 candidate self-join has no
  *                                 streaming analog);
  *  6. exact decontamination     — against a benchmark redacted with
  *                                 the SAME PII pass (mirrors
  *                                 [[graft.streaming.DocStreams.ingest]];
  *                                 digesting raw benchmark text would
  *                                 let PII-bearing benchmark docs
  *                                 escape the filter).
  *
  * Every stage is optional so the oracle can check the SQL-mirrorable
  * subset exactly while the sketch stages are verified by their own
  * queries (q24/q27/q69/q70).
  */
object Corpus {

  def clean(docs: DataFrame,
            benchmark: Option[DataFrame] = None,
            minQuality: Double = 0.25,
            lang: Option[String] = None,
            redact: Boolean = true,
            sampleFrac: Double = 1.0,
            nearDupThreshold: Option[Double] = None,
            nearDupKeepBest: Boolean = false,
            minCompressionRatio: Double = 0.0,
            maxDupLineFrac: Double = 1.0,
            lmTables: Option[(DataFrame, DataFrame)] = None,
            maxNll: Double = Double.MaxValue,
            qualityModel: Option[(Map[String, Double], Double)] = None,
            minModelProb: Double = 0.5,
            dropSpanNgram: Option[Int] = None,
            dropLineBoilerplateMinDocs: Option[Int] = None,
            dsir: Option[(Map[String, Double], Double, Double)] = None,
            normalizeUnicode: Boolean = false,
            blocklist: Option[Seq[String]] = None,
            blocklistCaseFold: Boolean = true,
            idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val T = TextFuncs
    // stage 0: canonical spelling before anything reads or digests
    // text. clean_text runs PER LINE and lines rejoin on \n — a whole-
    // text clean would collapse newlines and silently blind the
    // line-granular stages downstream (maxDupLineFrac,
    // dropLineBoilerplateMinDocs) while merging every doc into one
    // "line".
    val canonical =
      if (normalizeUnicode)
        docs.withColumn(textCol, array_join(
          transform(
            split(graft.expr.NormFuncs.nfc_norm(col(textCol)), "\n"),
            l => graft.expr.NormFuncs.clean_text(l)),
          "\n"))
      else docs
    val gated = {
      // DSIR floor first when present: (ratioMap, default, minLogw) —
      // the shuffle-free scalar form ([[Dsir.logwColumn]]), a pure
      // projection like the heuristics, applied to RAW text to match
      // the fit side (same contract as DocStreams.ingest's gate)
      val qd = dsir.fold(canonical) { case (ratios, dflt, minLogw) =>
        canonical.filter(
          Dsir.logwColumn(col(textCol), ratios, dflt) >= minLogw)
      }
      val q0 = qd.filter(T.qualityScore(col(textCol)) >= minQuality)
      val q1 =
        if (minCompressionRatio > 0.0)
          // deflate-ratio gate: templated/repetitive docs compress far
          // below prose (part of the quality gate, so it runs before
          // any digesting)
          q0.filter(Compression.compressionRatio(col(textCol)) >=
            minCompressionRatio)
        else q0
      val q2 =
        if (maxDupLineFrac < 1.0)
          // line-shape gate (FineWeb): a doc whose lines repeat is a
          // listing/scraper echo, not prose — same narrow-projection
          // family as the score gate
          q1.filter(T.duplicateLineFraction(col(textCol)) <=
            maxDupLineFrac)
        else q1
      // blocklist gate: one Aho-Corasick pass over the text (q167's
      // expression), in the narrow-projection family. MultiMatch
      // matches EXACT case-sensitive substrings; blocklistCaseFold
      // (default ON) lowercases BOTH sides so a composed clean cannot
      // silently miss "Viagra" against a lowercase blocklist — turn it
      // off only when the blocklist is deliberately case-sensitive.
      val blocked = blocklist.fold(q2) { pats =>
        val (side, ps) =
          if (blocklistCaseFold) (lower(col(textCol)), pats.map(_.toLowerCase))
          else (col(textCol), pats)
        q2.filter(!graft.expr.MultiMatch.contains_any(side, ps.distinct))
      }
      lang.fold(blocked)(l => blocked.filter(T.langId(col(textCol)) === l))
    }
    // model gates AFTER the narrow heuristics (they involve joins, so
    // every heuristically-dropped row is a join row saved), BEFORE
    // redaction (both models score raw text, like their train side)
    val lmGated = lmTables.fold(gated) { case (uni, bi) =>
      val scores = LangModel.nllScores(gated, uni, bi,
        idCol = idCol, textCol = textCol)
        .select(col(idCol), col("avg_nll"))
      // docs too short to score (no bigrams) pass: absence of evidence
      gated.join(scores, Seq(idCol), "left")
        .filter(col("avg_nll").isNull || col("avg_nll") <= maxNll)
        .drop("avg_nll")
    }
    val modelGated = qualityModel.fold(lmGated) { case (w, b) =>
      val scores = QualityModel.score(lmGated, w, b, idCol, textCol)
      lmGated.join(scores, Seq(idCol), "left")
        .filter(col("prob") >= minModelProb)
        .drop("prob")
    }
    val redacted =
      if (redact) modelGated.withColumn(textCol, T.redactPii(col(textCol)))
      else modelGated
    // structural line boilerplate first (cheaper key: whole lines),
    // then n-gram span removal — both after redaction (they rewrite
    // text) and before any digesting, so boilerplate never pollutes
    // dedup signatures
    val lined = dropLineBoilerplateMinDocs.fold(redacted)(m =>
      TextFuncs.dropBoilerplateLines(redacted, m, idCol = idCol,
        textCol = textCol))
    val spanned = dropSpanNgram.fold(lined)(n =>
      Dedup.dropDuplicateSpans(lined, n, idCol = idCol, textCol = textCol))
    val sampled =
      if (sampleFrac >= 1.0) spanned
      else spanned.filter(Splits.sampleHash(col(textCol),
        Splits.stratumThreshold(lit(""), Map.empty, sampleFrac)))
    val exact = Dedup.exact(sampled, idCol, textCol)
    val nearDeduped = nearDupThreshold.fold(exact) { th =>
      val pairs =
        Dedup.minhashPairs(exact, th, idCol = idCol, textCol = textCol)
          .select(col("id_a"), col("id_b"))
      // keepBest: each cluster keeps its highest-quality member (clean
      // original over ad-littered scrape) instead of the arbitrary
      // minimum id — same survivor count, better survivors
      if (nearDupKeepBest)
        graft.ops.ConnectedComponents.dedupByComponentBest(exact, pairs,
          T.qualityScore(col(textCol)), idCol)
      else
        graft.ops.ConnectedComponents.dedupByComponent(exact, pairs,
          idCol)
    }
    benchmark.fold(nearDeduped) { bench =>
      val benchNorm =
        if (redact) bench.withColumn(textCol, T.redactPii(col(textCol)))
        else bench
      graft.streaming.DocStreams.decontaminateStream(
        nearDeduped, benchNorm, textCol)
    }
  }
}
