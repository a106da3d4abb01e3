package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class ModelsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  lazy val q = emb.filter($"vec_id" < 5)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name")
    d.toFile.deleteOnExit()
    d.resolve("model").toString
  }

  test("load∘save is the identity for centroids and codebooks") {
    val cents = Ivf.kmeansCentroids(emb, nlist = 8, iters = 2)
    val p1 = tmp("cents")
    Models.saveCentroids(spark, p1, cents)
    val back = Models.loadCentroids(spark, p1)
    assert(back.length == cents.length)
    cents.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }

    val books = Ivf.pqCodebooks(emb, m = 8, k = 16, iters = 2)
    val p2 = tmp("books")
    Models.saveCodebooks(spark, p2, books)
    val backB = Models.loadCodebooks(spark, p2)
    assert(backB.length == books.length)
    for (s <- books.indices) {
      assert(backB(s).length == books(s).length)
      books(s).zip(backB(s)).foreach { case (a, b) =>
        assert(a.sameElements(b)) // bit-exact: floats stored as FLOAT
      }
    }
  }

  test("a query served from a persisted model is bit-identical to in-memory") {
    val cents = Ivf.kmeansCentroids(emb, nlist = 8, iters = 1)
    val books = Ivf.pqCodebooks(emb, m = 8, k = 16, iters = 1)
    val dir = tmp("ivfadc")
    Models.saveIvfAdc(spark, dir, cents, books)
    val (lc, lb) = Models.loadIvfAdc(spark, dir)

    val inMem = Ivf.ivfAdcTopKWithModels(emb, q, k = 5, cents, books,
        nprobe = 3)
      .select($"query_id", $"vec_id", $"sim", $"rk")
      .collect().map(_.toSeq).toSet
    val persisted = Ivf.ivfAdcTopKWithModels(emb, q, k = 5, lc, lb,
        nprobe = 3)
      .select($"query_id", $"vec_id", $"sim", $"rk")
      .collect().map(_.toSeq).toSet
    assert(inMem == persisted)

    // pure-PQ path through the same persisted codebooks
    val pqMem = Ivf.pqTopKWithBooks(emb, q, k = 5, books)
      .collect().map(_.toSeq).toSet
    val pqLoaded = Ivf.pqTopKWithBooks(emb, q, k = 5, lb)
      .collect().map(_.toSeq).toSet
    assert(pqMem == pqLoaded)
  }

  test("IMI halves round-trip, including odd-dim ragged halves") {
    val (c1, c2) = Ivf.imiCentroids(emb, k = 4, iters = 1)
    val p = tmp("imi")
    Models.saveImi(spark, p, c1, c2)
    val (b1, b2) = Models.loadImi(spark, p)
    c1.zip(b1).foreach { case (a, b) => assert(a.sameElements(b)) }
    c2.zip(b2).foreach { case (a, b) => assert(a.sameElements(b)) }

    // ragged: halves of different widths survive the rebuild
    val odd1 = Array(Array(1.5f, -2.0f, 0.25f))
    val odd2 = Array(Array(3.0f, 4.0f))
    val p2 = tmp("imi-odd")
    Models.saveImi(spark, p2, odd1, odd2)
    val (o1, o2) = Models.loadImi(spark, p2)
    assert(o1(0).sameElements(odd1(0)) && o2(0).sameElements(odd2(0)))
  }

  test("tokenizer models: load∘save identity, persisted encode bit-identical") {
    val docs = Tables.documents(spark, sf0001).limit(60).cache()
    val probe = docs.limit(20)

    // BPE: merge ORDER is the model — verify rank survives the round
    // trip and a fresh encode from the loaded list matches exactly
    val merges = Vocab.trainBpe(docs, $"text", numMerges = 12)
    val pb = tmp("bpe")
    Models.saveBpe(spark, pb, merges)
    val mergesBack = Models.loadBpe(spark, pb)
    assert(mergesBack == merges)
    val encA = probe.select($"doc_id",
        Vocab.bpe_encode($"text", merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val encB = probe.select($"doc_id",
        Vocab.bpe_encode($"text", mergesBack).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(encA == encB && encA.nonEmpty)

    // unigram: (piece, logp) doubles round-trip bit-exact; Viterbi
    // segmentation from the loaded model is identical
    val pieces = Vocab.trainUnigram(docs, $"text", vocabSize = 200, iters = 2)
    val pu = tmp("unigram")
    Models.saveUnigram(spark, pu, pieces)
    val piecesBack = Models.loadUnigram(spark, pu)
    assert(piecesBack == pieces)
    val segA = probe.select($"doc_id",
        Vocab.unigram_encode($"text", pieces).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val segB = probe.select($"doc_id",
        Vocab.unigram_encode($"text", piecesBack).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(segA == segB && segA.nonEmpty)
  }

  test("LM count tables: persisted scoring equals in-session scoring") {
    val docs = Tables.documents(spark, sf0001).limit(80).cache()
    val ref = Tables.documents(spark, sf0001).limit(200)
    val uni = LangModel.unigramCounts(ref, $"text")
    val bi = LangModel.bigramCounts(ref, $"text", minCount = 2)
    val dir = tmp("lm")
    Models.saveLmTables(dir, uni, bi)
    val (uniBack, biBack) = Models.loadLmTables(spark, dir)
    // exact integer counts → identical tables
    assert(uniBack.orderBy("w").collect().toSeq ==
      uni.select("w", "c").orderBy("w").collect().toSeq)
    assert(biBack.orderBy("w1", "w2").collect().toSeq ==
      bi.select("w1", "w2", "c").orderBy("w1", "w2").collect().toSeq)
    // served-from-parquet scoring is bit-identical for add-k and KN
    def scores(u: org.apache.spark.sql.DataFrame,
               b: org.apache.spark.sql.DataFrame) =
      LangModel.nllScores(docs, u, b)
        .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(scores(uniBack, biBack) == scores(uni, bi))
    def kn(b: org.apache.spark.sql.DataFrame) =
      LangModel.knNllScores(docs, b)
        .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(kn(biBack) == kn(bi))
  }

  test("quality model: load∘save identity, fresh-session scoring " +
      "bit-identical from parquet alone") {
    val docs = Tables.documents(spark, sf0001)
      .filter($"text".isNotNull).limit(80)
      .withColumn("label", ($"doc_id" % 2 === 0).cast("int"))
    val (w, b) = QualityModel.train(docs, epochs = 2)
    assert(w.nonEmpty)
    val p = tmp("qmodel")
    Models.saveQualityModel(spark, p, w, b)
    val (w2, b2) = Models.loadQualityModel(spark, p)
    assert(w2 == w && b2 == b) // DOUBLE storage: exact identity
    // scoring from the loaded model reproduces every probability bit
    // for bit — the train-once/serve-many contract
    val a = QualityModel.score(docs, w, b)
      .as[(Long, Double)].collect().toMap
    val c = QualityModel.score(docs, w2, b2)
      .as[(Long, Double)].collect().toMap
    assert(a == c)
  }

  test("DSIR ratio table: load∘save identity, persisted gating " +
      "bit-identical in both the join and scalar forms") {
    val target = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 3 === 0).limit(40)
    val raw = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 3 =!= 0).limit(80)
    val ratios = Dsir.logRatios(target, raw)
    val p = tmp("dsir")
    Models.saveDsir(p, ratios)
    val back = Models.loadDsir(spark, p)
    // table identity (fh is a unique key, order-insensitive)
    val origRows = ratios.as[(String, Double)].collect().toMap
    val backRows = back.as[(String, Double)].collect().toMap
    assert(backRows == origRows)
    // DataFrame scoring form
    val a = Dsir.importanceScores(raw, ratios)
      .as[(Long, Double)].collect().toMap
    val b = Dsir.importanceScores(raw, back)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    // scalar/streaming form via ratioMap
    val (m1, d1) = Dsir.ratioMap(ratios)
    val (m2, d2) = Dsir.ratioMap(back)
    assert(m1 == m2 && d1 == d2)
  }

  test("load∘save is the identity for LSH plans (the incremental-dedup " +
    "split-consistency seam)") {
    val plan = LshPlan.plan(0.4)
    val p = tmp("lshplan")
    Models.saveLshPlan(spark, p, plan, shingleSize = 7)
    val (back, shingle) = Models.loadLshPlan(spark, p)
    assert(back == plan && shingle == 7)
    // a persisted plan drives incrementalDedup to the exact split its
    // corpus sketches were built with
    assert((back.bands, back.rowsPerBand) == (plan.bands, plan.rowsPerBand))
  }
}
