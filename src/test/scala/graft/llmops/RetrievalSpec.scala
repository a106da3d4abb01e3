package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-retrieval")
    d.toFile.deleteOnExit()
    d.resolve("idx").toString
  }

  test("buildIndex -> search: questions find their source passages " +
      "through the persisted index alone") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The board raised the quarterly dividend."),
      (2L, "The weather station recorded heavy rainfall. Winds stayed " +
        "calm through the evening. Barometric pressure fell slowly."),
      (3L, "The migration moved the cluster to new hardware. Latency " +
        "dropped after the cache warmup. Throughput doubled at peak."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 128,
      nlist = 4, m = 4)

    // the chunk table landed with composite ids and real text
    val chunks = spark.read.parquet(s"$path/chunks")
    assert(chunks.columns.toSeq ==
      Seq("vec_id", "doc_id", "chunk_idx", "chunk_text"))
    assert(chunks.count() >= 3)
    // hash vec_ids: non-negative (the remap guard's invariant), unique
    assert(chunks.filter($"vec_id" < 0).count() == 0)
    assert(chunks.select($"vec_id").distinct().count() == chunks.count())

    // a FRESH search session: everything needed is on disk
    val questions = Seq(
      (0L, "was the dividend raised"),
      (1L, "how much rainfall was recorded"),
      (2L, "what happened to latency"))
      .toDF("query_id", "text")
    val hits = Retrieval.search(spark, path, questions, k = 1,
      nprobe = 4)
    assert(hits.columns.toSeq == Seq("query_id", "rk", "doc_id",
      "chunk_idx", "chunk_text", "sim"))
    val best = hits.filter($"rk" === 1)
      .select($"query_id", $"doc_id").as[(Long, Long)]
      .collect().toMap
    assert(best == Map(0L -> 1L, 1L -> 2L, 2L -> 3L), s"best=$best")
    // the passage text rides along for the consumer
    assert(hits.filter($"rk" === 1 && $"query_id" === 0L)
      .select($"chunk_text").as[String].head()
      .toLowerCase.contains("dividend"))
  }

  test("appendDocs: passages from appended documents are served " +
      "without a rebuild") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."),
      (2L, "Rainfall was heavy and winds were calm all evening there."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 128,
      nlist = 2, m = 4)
    Retrieval.appendDocs(
      Seq((7L, "The cluster migration halved latency at peak load."))
        .toDF("doc_id", "text"), path)
    // the appended doc is SERVED from the persisted files (ranking
    // quality at 3-vector codebook scale is AnnIndexSpec's domain —
    // here the contract is append-then-serve with no rebuild)
    val hits = Retrieval.search(spark, path,
      Seq((0L, "what halved the cluster latency at peak"))
        .toDF("query_id", "text"),
      k = 10, nprobe = 2)
    assert(hits.filter($"doc_id" === 7L).count() >= 1,
      s"appended doc absent from ${hits.collect().toSeq}")
    // its chunk rows and index codes are on disk
    val newVecIds = spark.read.parquet(s"$path/chunks")
      .filter($"doc_id" === 7L).select($"vec_id").as[Long].collect().toSet
    assert(newVecIds.nonEmpty)
    assert(spark.read.parquet(s"$path/index")
      .filter($"vec_id".isin(newVecIds.toSeq: _*)).count()
      == newVecIds.size)
  }

  test("searchDiverse: over-retrieve then MMR — near-duplicate " +
      "passages give way to distinct aspects") {
    // doc 1/2 are near-identical (the same revenue sentence), doc 3 is
    // a distinct aspect with lower relevance to the query
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter and margins held."),
      (2L, "Revenue grew nine percent this quarter and margins rose."),
      (3L, "The dividend was raised by the board at the annual vote."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 128,
      nlist = 2, m = 4)
    val queries = Seq((0L, "revenue grew this quarter margins"))
      .toDF("query_id", "text")
    val diverse = Retrieval.searchDiverse(spark, path, queries,
        k = 2, fetchK = 3, nprobe = 2, lambda = 0.5)
      .orderBy($"rk")
    assert(diverse.columns.toSeq == Seq("query_id", "rk", "doc_id",
      "chunk_idx", "chunk_text", "mmr_score"))
    val picks = diverse.select($"doc_id").as[Long].collect().toSeq
    assert(picks.length == 2)
    // rank 1 is one of the revenue twins; rank 2 must be the DISTINCT
    // doc 3, not the near-duplicate twin
    assert(Set(1L, 2L).contains(picks.head), s"picks=$picks")
    assert(picks(1) == 3L, s"picks=$picks")
  }

  test("hybridSearch: RRF fuses lexical and vector ranks; exact rare " +
      "terms surface even when the embedding smears them") {
    val docs = Seq(
      (1L, "The incident ticket referenced error code EX4711 in the " +
        "payment service logs during the outage window."),
      (2L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The dividend was raised."),
      (3L, "Rainfall was heavy and the winds were calm through the " +
        "whole evening at the coastal station."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 300, dim = 128,
      nlist = 2, m = 4)
    val hits = Retrieval.hybridSearch(spark, path,
      Seq((0L, "ex4711 error"),
        (1L, "revenue margins dividend raised this quarter"))
        .toDF("query_id", "text"), k = 2, nprobe = 2)
    assert(hits.columns.toSeq == Seq("query_id", "rk", "doc_id",
      "chunk_idx", "chunk_text", "rrf_score"))
    val best = hits.filter($"rk" === 1)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toMap
    assert(best(0L) == 1L, s"exact-term query routed to ${best(0L)}")
    assert(best(1L) == 2L)
    // a doc ranked by BOTH sides outscores single-side hits
    val scores = hits.filter($"query_id" === 1L)
      .select($"rrf_score").as[Double].collect()
    assert(scores.nonEmpty && scores.max <= 2.0 / 61 + 1e-9)
  }

  test("hybridSearch: the set-based lexical batch reproduces the " +
      "per-query formulation exactly") {
    val docs = Seq(
      (1L, "The incident ticket referenced error code EX4711 in the " +
        "payment service logs during the outage window."),
      (2L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The dividend was raised."),
      (3L, "Rainfall was heavy and the winds were calm through the " +
        "whole evening at the coastal station."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 120, dim = 128,
      nlist = 2, m = 4)
    val queries = Seq(
      (0L, "ex4711 error"),
      (1L, "revenue margins dividend raised this quarter"),
      (2L, "calm winds in the evening"))
      .toDF("query_id", "text")
    val k = 2; val rrfK = 60
    val got = Retrieval.hybridSearch(spark, path, queries, k = k,
        nprobe = 2)
      .select($"query_id", $"rk", $"doc_id", $"chunk_idx", $"rrf_score")
      .as[(Long, Int, Long, Int, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap

    // reference: the per-query-loop formulation the batch replaced
    val chunks = spark.read.parquet(s"$path/chunks")
    val vcMap = chunks.select($"vec_id", $"doc_id", $"chunk_idx")
      .as[(Long, Long, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val vec = Retrieval.search(spark, path, queries, k, 2)
      .join(chunks.select($"vec_id", $"doc_id", $"chunk_idx"),
        Seq("doc_id", "chunk_idx"))
      .select($"query_id", $"vec_id", $"rk").as[(Long, Long, Int)]
      .collect().map { case (q, v, r) => (q, v) -> r }.toMap
    val lex = queries.as[(Long, String)].collect().flatMap {
      case (qid, text) =>
        Bm25.topK(chunks, text.toLowerCase.split("\\s+").toSeq, k,
            idCol = "vec_id", textCol = "chunk_text")
          .collect().zipWithIndex
          .map { case (r, i) => (qid, r.getLong(0)) -> (i + 1) }
    }.toMap
    val want = (vec.keySet ++ lex.keySet).toSeq
      .map { key =>
        (key, vec.get(key).map(r => 1.0 / (rrfK + r)).getOrElse(0.0) +
          lex.get(key).map(r => 1.0 / (rrfK + r)).getOrElse(0.0))
      }
      .groupBy(_._1._1).flatMap { case (qid, rows) =>
        rows.sortBy { case ((_, v), s) => (-s, v) }.take(k).zipWithIndex
          .map { case (((_, v), s), i) =>
            (qid, i + 1) -> ((vcMap(v)._1, vcMap(v)._2, s)) }
      }
    assert(got.keySet == want.keySet, s"got=$got want=$want")
    want.foreach { case (key, (d, c, s)) =>
      val (gd, gc, gs) = got(key)
      assert(gd == d && gc == c && math.abs(gs - s) < 1e-12,
        s"$key: got=${got(key)} want=${(d, c, s)}")
    }
  }

  test("the lexical postings land with the index, grow on append, and " +
      "hybridSearch works with or without them (old layouts)") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."),
      (2L, "Rainfall was heavy and winds were calm all evening there."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 64,
      nlist = 2, m = 4)
    assert(spark.read.parquet(s"$path/lexical/postings").count() > 0)
    val before = spark.read.parquet(s"$path/lexical/stats").count()
    Retrieval.appendDocs(
      Seq((7L, "The cluster migration halved latency at peak load."))
        .toDF("doc_id", "text"), path)
    assert(spark.read.parquet(s"$path/lexical/stats").count() == before + 1)
    val queries = Seq((0L, "cluster latency"), (1L, "dividend revenue"))
      .toDF("query_id", "text")
    val served = Retrieval.hybridSearch(spark, path, queries, k = 2,
        nprobe = 2)
      .select($"query_id", $"rk", $"doc_id").as[(Long, Int, Long)]
      .collect().toSet
    // pre-lexical-index layout: drop /lexical, the fallback scan path
    // must produce the IDENTICAL ranking (Bm25IndexSpec pins the
    // ranked surfaces equal, so the fused output cannot differ)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(s"$path/lexical"))
    val fallback = Retrieval.hybridSearch(spark, path, queries, k = 2,
        nprobe = 2)
      .select($"query_id", $"rk", $"doc_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(fallback == served, s"served=$served fallback=$fallback")
    // and append on the old layout still works (no lexical dir)
    Retrieval.appendDocs(
      Seq((9L, "Another appended document about barometric pressure."))
        .toDF("doc_id", "text"), path)
    assert(Retrieval.search(spark, path,
        Seq((0L, "barometric pressure")).toDF("query_id", "text"),
        k = 10, nprobe = 2)
      .filter($"doc_id" === 9L).count() >= 1)
  }

  test("ingestStream: a document stream grows the index per " +
      "micro-batch, serveable throughout") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 64,
      nlist = 2, m = 4)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Retrieval.ingestStream(
        mem.toDF().toDF("doc_id", "text"), path)
      .outputMode("update").start()
    mem.addData((5L, "Rainfall was heavy and winds were calm there."))
    q.processAllAvailable()
    mem.addData((6L, "The cluster migration halved latency at peak."))
    q.processAllAvailable()
    q.stop()
    val served = Retrieval.search(spark, path,
        Seq((0L, "anything at all really")).toDF("query_id", "text"),
        k = 10, nprobe = 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(Set(1L, 5L, 6L).subsetOf(served), s"served=$served")
    // the at-least-once ledger recorded each applied batch exactly once
    assert(spark.read.parquet(s"$path/_batches")
      .select($"batch_id").as[Long].collect().sorted.toSeq.size == 2)
  }

  test("guards: negative DOC ids (hash-keyed ingests) index and serve; " +
      "negative query ids fail fast; null query text cannot crash " +
      "hybrid search") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter and margins held."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 64,
      nlist = 2, m = 4)
    // negative doc ids — what xxhash64-keyed ingests produce — are a
    // first-class id space now (hash vec_ids, no composite overflow)
    val negPath = tmp()
    Retrieval.buildIndex(
      Seq((-6075990116865310859L, "The dividend was raised by the board."))
        .toDF("doc_id", "text"), negPath, targetChars = 200, dim = 64,
      nlist = 2, m = 4)
    val negHits = Retrieval.search(spark, negPath,
      Seq((0L, "dividend raised")).toDF("query_id", "text"), k = 1,
      nprobe = 2)
    assert(negHits.select($"doc_id").as[Long].head()
      == -6075990116865310859L)
    // negative query id: would remap INTO vec_id space
    intercept[IllegalArgumentException] {
      Retrieval.search(spark, path,
        Seq((-3L, "margins")).toDF("query_id", "text"), k = 1)
    }
    // null query text rides the vector side only, no driver NPE
    val hits = Retrieval.hybridSearch(spark, path,
      Seq((0L, Option.empty[String]), (1L, Some("revenue margins")))
        .toDF("query_id", "text"), k = 1, nprobe = 2)
    assert(hits.filter($"query_id" === 1L).count() >= 1)
  }

  test("compact: an interrupted-batch double-append is squeezed out — " +
      "serving equals a clean build afterward") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. The dividend rose."),
      (2L, "Rainfall was heavy and winds were calm all evening there."))
      .toDF("doc_id", "text")
    val late = Seq(
      (7L, "The cluster migration halved latency at peak load."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 64,
      nlist = 2, m = 4)
    // simulate a replayed uncommitted ingest batch: the same docs
    // append twice (vec_ids are deterministic, so rows are exact dups)
    Retrieval.appendDocs(late, path)
    Retrieval.appendDocs(late, path)
    val chunks = spark.read.parquet(s"$path/chunks")
    assert(chunks.filter($"doc_id" === 7L).count() >
      chunks.filter($"doc_id" === 7L).select($"vec_id")
        .distinct().count()) // duplicates present
    Retrieval.compact(spark, path)
    // chunks deduped, codes rebuilt 1:1, lexical rebuilt
    val after = spark.read.parquet(s"$path/chunks")
    assert(after.count() == after.select($"vec_id").distinct().count())
    assert(spark.read.parquet(s"$path/index")
      .select($"vec_id").distinct().count() == after.count())
    // serving matches the SINGLE-append path (same models — trained on
    // the base docs in both — same corpus): compact must make the
    // double-append indistinguishable from the clean history
    val clean = tmp()
    Retrieval.buildIndex(docs, clean, targetChars = 60, dim = 64,
      nlist = 2, m = 4)
    Retrieval.appendDocs(late, clean)
    val q = Seq((0L, "cluster latency"), (1L, "dividend revenue"))
      .toDF("query_id", "text")
    val a = Retrieval.search(spark, path, q, k = 3, nprobe = 2)
      .select($"query_id", $"rk", $"doc_id", $"chunk_idx")
      .as[(Long, Int, Long, Int)].collect().toSet
    val b = Retrieval.search(spark, clean, q, k = 3, nprobe = 2)
      .select($"query_id", $"rk", $"doc_id", $"chunk_idx")
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(a == b, s"a=$a b=$b")
  }

  test("query id zero cannot collide with chunk vec_id zero") {
    // doc 0 chunk 0 has vec_id 0; a query with id 0 must still be
    // able to retrieve it (the negative-remap guard)
    val docs = Seq(
      (0L, "The annual dividend increase was approved by the board."),
      (1L, "Rainfall and winds dominated the weather report today."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 64,
      nlist = 2, m = 4)
    val hits = Retrieval.search(spark, path,
      Seq((0L, "dividend increase approved")).toDF("query_id", "text"),
      k = 1, nprobe = 2)
    assert(hits.select($"doc_id").as[Long].head() == 0L)
  }

  test("deleteDocs: a takedown vanishes from vector, lexical, and " +
      "hybrid serving; compact purges permanently; upsertDocs " +
      "replaces a changed document under the same ids") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The board raised the quarterly dividend."),
      (2L, "The weather station recorded heavy rainfall. Winds stayed " +
        "calm through the evening. Barometric pressure fell slowly."),
      (3L, "The migration moved the cluster to new hardware. Latency " +
        "dropped after the cache warmup. Throughput doubled at peak."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 128,
      nlist = 4, m = 4)
    val questions = Seq((0L, "was the quarterly dividend raised"))
      .toDF("query_id", "text")
    assert(Retrieval.search(spark, path, questions, k = 3, nprobe = 4)
      .filter($"doc_id" === 1).count() > 0, "fixture must serve doc 1")

    Retrieval.deleteDocs(spark, path, Seq(1L).toDF("doc_id"))
    assert(Retrieval.search(spark, path, questions, k = 3, nprobe = 4)
      .filter($"doc_id" === 1).count() == 0, "vector tier still serves it")
    assert(Retrieval.hybridSearch(spark, path, questions, k = 3,
      nprobe = 4).filter($"doc_id" === 1).count() == 0,
      "hybrid (lexical tier) still serves it")

    Retrieval.deleteDocs(spark, path, Seq(1L).toDF("doc_id")) // idempotent
    Retrieval.compact(spark, path)
    assert(spark.read.parquet(s"$path/chunks")
      .filter($"doc_id" === 1).count() == 0,
      "compact must not resurrect tombstoned chunks")
    assert(!new java.io.File(s"$path/chunk_tombstones").exists())
    val q2 = Seq((0L, "how much rainfall was recorded"))
      .toDF("query_id", "text")
    assert(Retrieval.search(spark, path, q2, k = 1, nprobe = 4)
      .filter($"doc_id" === 2).count() == 1, "survivors must still serve")

    // upsert: doc 2 re-crawls with entirely new text — same doc_id
    // means the SAME chunk vec_ids, so append alone would collide;
    // upsertDocs must physically replace
    val newDoc2 = Seq((2L, "The dividend policy changed. Payout ratios " +
      "moved to forty percent. Shareholders approved the plan."))
      .toDF("doc_id", "text")
    Retrieval.upsertDocs(newDoc2, path)
    val texts = spark.read.parquet(s"$path/chunks")
      .filter($"doc_id" === 2).select($"chunk_text").as[String].collect()
    assert(texts.nonEmpty && texts.forall(!_.contains("rainfall")),
      "stale text survived the upsert")
    assert(texts.exists(_.contains("Payout")))
    val all = spark.read.parquet(s"$path/chunks")
    assert(all.select($"vec_id").distinct().count() == all.count(),
      "id-uniqueness must survive the upsert")
    assert(Retrieval.search(spark, path,
      Seq((0L, "what is the payout ratio")).toDF("query_id", "text"),
      k = 2, nprobe = 4).filter($"doc_id" === 2).count() > 0,
      "the replacement text must serve")
  }

  test("rollupDocs: max-sim per document, chunk evidence counted, " +
      "ties break to the smaller doc id") {
    val hits = Seq(
      (0L, 1, 10L, 0, "a", 0.9), (0L, 2, 10L, 1, "b", 0.7),
      (0L, 3, 20L, 0, "c", 0.8),
      (0L, 4, 30L, 0, "d", 0.8),  // ties 20 on doc_sim → 20 wins by id
      (1L, 1, 20L, 2, "e", 0.5)
    ).toDF("query_id", "rk", "doc_id", "chunk_idx", "chunk_text", "sim")
    val got = Retrieval.rollupDocs(hits, k = 2)
      .orderBy($"query_id", $"rk")
      .select($"query_id", $"rk", $"doc_id", $"doc_sim", $"n_chunks")
      .as[(Long, Int, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1, 10L, 0.9, 2L),
      (0L, 2, 20L, 0.8, 1L),
      (1L, 1, 20L, 0.5, 1L)), s"got=$got")
  }

  test("searchDocs: document-level serving routes each question to " +
      "its source document through the persisted files alone") {
    val docs = Seq(
      (1L, "Revenue grew nine percent this quarter. Margins compressed " +
        "in the retail arm. The board raised the quarterly dividend."),
      (2L, "The weather station recorded heavy rainfall. Winds stayed " +
        "calm through the evening. Barometric pressure fell slowly."),
      (3L, "The migration moved the cluster to new hardware. Latency " +
        "dropped after the cache warmup. Throughput doubled at peak."))
      .toDF("doc_id", "text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 60, dim = 128,
      nlist = 4, m = 4)
    val questions = Seq(
      (0L, "was the dividend raised"),
      (1L, "how much rainfall was recorded"),
      (2L, "what happened to latency"))
      .toDF("query_id", "text")
    val top = Retrieval.searchDocs(spark, path, questions, k = 1,
        fetchK = 6, nprobe = 4)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toMap
    assert(top == Map(0L -> 1L, 1L -> 2L, 2L -> 3L), s"top=$top")
  }

  test("evalMetrics: exact recall/MRR/nDCG at the cutoff; no-hit " +
      "queries score zero; beyond-k hits do not count") {
    val hits = Seq(
      // q0: relevant at ranks 1 and 3 (of 3 relevant) at k=3
      (0L, 1, 10L), (0L, 2, 99L), (0L, 3, 11L), (0L, 4, 12L),
      // q1: first relevant at rank 2 (1 relevant)
      (1L, 1, 98L), (1L, 2, 20L),
      // q2: nothing relevant retrieved
      (2L, 1, 97L)
    ).toDF("query_id", "rk", "doc_id")
    val qrels = Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L),
      (2L, 30L), (2L, 30L)).toDF("query_id", "doc_id") // dup tolerated
    val got = Retrieval.evalMetrics(hits, qrels, k = 3)
      .orderBy($"query_id")
      .select($"query_id", $"n_rel", $"n_hit", $"recall_at_k",
        $"mrr_at_k", $"ndcg_at_k")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    val ln2 = math.log(2.0)
    def d(r: Int) = 1.0 / (math.log(r + 1.0) / ln2)
    val ndcg0 = (d(1) + d(3)) / (d(1) + d(2) + d(3))
    val ndcg1 = d(2) / d(1)
    assert(got.size == 3)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(got(0)._1 == 0L && got(0)._2 == 3L && got(0)._3 == 2L &&
      close(got(0)._4, 2.0 / 3) && got(0)._5 == 1.0 &&
      close(got(0)._6, ndcg0), s"${got(0)}")
    assert(got(1)._1 == 1L && got(1)._2 == 1L && got(1)._3 == 1L &&
      got(1)._4 == 1.0 && got(1)._5 == 0.5 &&
      close(got(1)._6, ndcg1), s"${got(1)}")
    assert(got(2) == ((2L, 1L, 0L, 0.0, 0.0, 0.0)), s"${got(2)}")
    // doc 12 was retrieved at rank 4 — beyond k=3, must not count
  }

  test("tuneHybrid: one row per grid cell; the fetchK == evalK cell's " +
      "metrics replay evalMetrics over the ACTUAL hybrid serving " +
      "output; deterministic across reruns") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"doc_id" < 80).select($"doc_id", $"text")
    val path = tmp()
    Retrieval.buildIndex(docs, path, targetChars = 200, dim = 64,
      nlist = 8, m = 8)
    val qs = Seq((0L, "vector window merge"), (1L, "stream processing"))
      .toDF("query_id", "text")
    val qrels = docs
      .filter($"text".contains("vector")).select(lit(0L).as("query_id"),
        $"doc_id")
      .unionByName(docs.filter($"text".contains("stream"))
        .select(lit(1L).as("query_id"), $"doc_id"))
    val report = Retrieval.tuneHybrid(spark, path, qs, qrels, evalK = 4,
      fetchKs = Seq(4, 8), nprobes = Seq(2), rrfKs = Seq(20, 60))
    val rows = report.collect()
    assert(rows.length == 4) // 2 fetchKs × 1 nprobe × 2 rrfKs
    assert(rows.forall(_.getAs[Long]("n_queries") == 2L))
    // parity at (fetchK = evalK = 4, nprobe = 2, rrfK = 60): the cell's
    // means must equal evalMetrics over hybridSearch's own output,
    // doc-rolled-up the same way
    val hits = Retrieval.hybridSearch(spark, path, qs, k = 4,
        nprobe = 2, rrfK = 60)
      .groupBy($"query_id", $"doc_id").agg(min($"rk").as("__mr"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"__mr", $"doc_id")))
    val direct = Retrieval.evalMetrics(hits, qrels, k = 4)
      .agg(avg($"recall_at_k"), avg($"mrr_at_k"), avg($"ndcg_at_k"))
      .as[(Double, Double, Double)].head()
    val cell = rows.find(r => r.getAs[Int]("fetch_k") == 4 &&
      r.getAs[Int]("rrf_k") == 60).get
    assert(math.abs(cell.getAs[Double]("mean_recall") - direct._1) < 1e-12)
    assert(math.abs(cell.getAs[Double]("mean_mrr") - direct._2) < 1e-12)
    assert(math.abs(cell.getAs[Double]("mean_ndcg") - direct._3) < 1e-12)
    // deterministic: a rerun reproduces every cell exactly
    val again = Retrieval.tuneHybrid(spark, path, qs, qrels, evalK = 4,
      fetchKs = Seq(4, 8), nprobes = Seq(2), rrfKs = Seq(20, 60))
    assert(again.collect().map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
  }

  test("snippets: densest window wins, earliest on ties, window " +
      "clamps at the doc tail, no-term hits yield no row") {
    val docs = Seq(
      (1L, "pad pad cat pad pad pad pad pad cat dog cat pad"),
      (2L, "nothing relevant here at all"),
      (3L, "cat dog")
    ).toDF("doc_id", "text")
    val hits = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("query_id", "doc_id")
    val queries = Seq((0L, "cat dog")).toDF("query_id", "text")
    val got = Retrieval.snippets(docs, hits, queries, window = 4)
      .orderBy($"doc_id")
      .select($"doc_id", $"snip_start", $"n_matched", $"snippet")
      .as[(Long, Int, Long, String)].collect().toSeq
    // doc 1: window [8, 12) = "cat dog cat pad" holds 3 matches;
    // the earlier lone cat at pos 2 holds 1
    assert(got == Seq(
      (1L, 8, 3L, "cat dog cat pad"),
      (3L, 0, 2L, "cat dog")), s"got=$got")
  }
}
