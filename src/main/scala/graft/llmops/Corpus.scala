package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call batch corpus cleaning: the composed path a training-data
  * user actually runs, assembling the llmops stages in the order that
  * is right at scale:
  *
  *  1. quality / language gate   — narrow, cheapest, runs first so
  *                                 every later stage sees fewer rows;
  *  2. PII redaction             — before ANY digesting, so no dedup
  *                                 or decontamination state ever holds
  *                                 raw PII, and exact matching is in
  *                                 one normalization everywhere;
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
            minCompressionRatio: Double = 0.0,
            idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val T = TextFuncs
    val gated = {
      val q0 = docs.filter(T.qualityScore(col(textCol)) >= minQuality)
      val q1 =
        if (minCompressionRatio > 0.0)
          // deflate-ratio gate: templated/repetitive docs compress far
          // below prose (part of the quality gate, so it runs before
          // any digesting)
          q0.filter(Compression.compressionRatio(col(textCol)) >=
            minCompressionRatio)
        else q0
      lang.fold(q1)(l => q1.filter(T.langId(col(textCol)) === l))
    }
    val redacted =
      if (redact) gated.withColumn(textCol, T.redactPii(col(textCol)))
      else gated
    val sampled =
      if (sampleFrac >= 1.0) redacted
      else redacted.filter(Splits.sampleHash(col(textCol),
        Splits.stratumThreshold(lit(""), Map.empty, sampleFrac)))
    val exact = Dedup.exact(sampled, idCol, textCol)
    val nearDeduped = nearDupThreshold.fold(exact) { th =>
      graft.ops.ConnectedComponents.dedupByComponent(exact,
        Dedup.minhashPairs(exact, th, idCol = idCol, textCol = textCol)
          .select(col("id_a"), col("id_b")),
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
