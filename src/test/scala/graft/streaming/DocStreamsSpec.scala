package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and then the fox " +
      "rests in the shade of a tall tree while the dog watches"

  test("ingest runs as a real stream: gate, redact, dedup, decontaminate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val contaminated = "the held out benchmark question about the fox"
    val benchmark = Seq(contaminated).toDF("text")
    // minQuality 0.6: "tiny" scores 0.5 (no length band, no stopwords)
    val q = DocStreams.ingest(docs, benchmark, minQuality = 0.6)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData(
      (t("2024-01-01 10:00:00"), 1L, goodText + " mail me a@b.io now"),
      (t("2024-01-01 10:00:10"), 2L, goodText + " mail me a@b.io now"), // dup of 1
      (t("2024-01-01 10:00:20"), 3L, "tiny"),                           // low quality
      (t("2024-01-01 10:00:30"), 4L, contaminated))                     // benchmark hit
    q.processAllAvailable()
    val out = spark.table("ingest_out").select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    q.stop()
    assert(out.keySet == Set(1L))
    assert(out(1L).contains("<EMAIL>") && !out(1L).contains("a@b.io"))
  }

  test("dedup state is horizon-bounded: same content re-admitted after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val q = DocStreams.dedupDocs(docs.toDF(), watermark = "1 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData((t("2024-01-01 10:00:00"), 1L, goodText))
    q.processAllAvailable()
    // push the watermark far past the first doc, then resend the content
    mem.addData((t("2024-01-01 12:00:00"), 2L, "filler to advance time"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 12:00:30"), 3L, goodText))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 3L)) // 3 re-admitted: state for doc 1 expired
  }

  test("PII-bearing benchmark doc still decontaminates the redacted stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    // the benchmark doc contains an email: the stream copy gets
    // redacted by cleanDocs, so digesting the RAW benchmark text
    // would never match — ingest must digest the redacted form
    val leaky = goodText + " contact Admin@Bench.ORG for the answer key"
    val benchmark = Seq(leaky).toDF("text")
    val q = DocStreams.ingest(docs, benchmark, minQuality = 0.0)
      .writeStream.format("memory").queryName("pii_bench_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData(
      (t("2024-01-01 10:00:00"), 1L, leaky),      // benchmark hit, must drop
      (t("2024-01-01 10:00:10"), 2L, goodText))   // clean, must survive
    q.processAllAvailable()
    val ids = spark.table("pii_bench_out").select($"doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(ids == Set(2L))
  }

  test("ingest sampleFrac downsamples deterministically before dedup") {
    val docs = graft.Tables.documents(spark, sf0001)
      .withColumn("ingest_ts",
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val noBench = docs.filter($"doc_id" < 0).select($"text")
    val all = DocStreams.ingest(docs, noBench, minQuality = 0.0)
    val half = DocStreams.ingest(docs, noBench, minQuality = 0.0, sampleFrac = 0.5)
    val none = DocStreams.ingest(docs, noBench, minQuality = 0.0, sampleFrac = 0.0)
    assert(none.count() == 0)
    val (nAll, nHalf) = (all.count(), half.count())
    assert(nHalf > 0 && nHalf < nAll)
    assert(math.abs(nHalf.toDouble / nAll - 0.5) < 0.15) // content-uniform
    // rerun → identical sample (content-keyed, no RNG)
    assert(DocStreams.ingest(docs, noBench, minQuality = 0.0, sampleFrac = 0.5)
      .count() == nHalf)
  }

  test("dsir gate runs in a real stream (append-legal, stateless) and " +
    "matches the batch logw floor") {
    implicit val sqlCtx = spark.sqlContext
    val D = graft.llmops.Dsir
    // target prefers "alpha beta"-style docs
    val target = Seq((1L, "alpha beta alpha beta gamma"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (10L, goodText + " alpha beta alpha beta"),
      (11L, goodText + " junk spam junk spam junk"))
      .toDF("doc_id", "text")
    val (m, dflt) = D.ratioMap(D.logRatios(target, raw))
    // floor between the two docs' batch scores
    val scores = raw.select($"doc_id",
        D.logwColumn($"text", m, dflt).as("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(10L) > scores(11L))
    val floor = (scores(10L) + scores(11L)) / 2
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val noBench = Seq.empty[String].toDF("text")
    val q = DocStreams.ingest(docs, noBench, minQuality = 0.0,
        dsir = Some((m, dflt, floor)))
      .writeStream.format("memory").queryName("dsir_gate_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    mem.addData(
      (t("2024-01-01 10:00:00"), 10L, goodText + " alpha beta alpha beta"),
      (t("2024-01-01 10:00:10"), 11L, goodText + " junk spam junk spam junk"))
    q.processAllAvailable()
    val out = spark.table("dsir_gate_out").select($"doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(out == Set(10L), s"got $out")
  }

  test("batch mode equals the batch llmops pipeline on the corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
      .withColumn("ingest_ts",
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val benchmark = docs.filter($"doc_id" % 100 === 0).select($"text")
    val got = DocStreams.ingest(docs, benchmark, minQuality = 0.0)
    // every benchmark text is gone, non-benchmark survivors unique by text
    assert(got.join(benchmark, Seq("text")).count() == 0)
    val n = got.count()
    assert(n > 0 && got.select($"text").distinct().count() == n)
  }

  test("normalizeUnicode: byte-spelling variants collapse in the " +
      "streaming dedup horizon, matching the batch stage 0") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val benchmark = Seq("unrelated benchmark").toDF("text")
    val q = DocStreams.ingest(docs, benchmark, minQuality = 0.0,
        normalizeUnicode = true)
      .writeStream.format("memory").queryName("norm_ingest_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf(_: String)
    val pre = goodText + " caf\u00E9" // precomposed spelling
    val comb = goodText + "  cafe\u0301 " // combining + whitespace noise
    mem.addData(
      (t("2024-01-01 10:00:00"), 1L, pre),
      (t("2024-01-01 10:00:10"), 2L, comb)) // same rendered doc
    q.processAllAvailable()
    val out = spark.table("norm_ingest_out")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    q.stop()
    assert(out.keySet == Set(1L), s"got ${out.keySet}")
    assert(out(1L) == pre) // landed text is the canonical spelling
  }
}
