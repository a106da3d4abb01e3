package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("toy LM: counts and add-k scores match hand computation") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    assert(uni.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 2L))
    assert(bi.as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap ==
      Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    // V=2, k=0.5: nll(a,b) = -ln(2.5/3), nll(b,a) = -ln(1.5/3)
    val expected = (2 * math.log(3 / 2.5) + math.log(3 / 1.5)) / 3
    val got = LangModel.nllScores(docs, uni, bi)
      .select($"n_bigrams", $"avg_nll").head()
    assert(got.getLong(0) == 3L)
    assert(math.abs(got.getDouble(1) - expected) < 1e-12)
  }

  test("unseen text hits the smoothing floor ln(V), never infinity") {
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(ref, $"text")
    val bi = LangModel.bigramCounts(ref, $"text")
    val oov = Seq((9L, "x y z")).toDF("doc_id", "text")
    val nll = LangModel.nllScores(oov, uni, bi)
      .select($"avg_nll").head().getDouble(0)
    assert(math.abs(nll - math.log(2.0)) < 1e-12, s"expected ln(V)=ln 2, got $nll")
  }

  test("self-perplexity separates boilerplate from gibberish") {
    val boiler = "the quick brown fox jumps over the lazy dog"
    val docs = ((0L until 20L).map(i => (i, boiler)) :+
      (99L, "zq xv qp wk jx vz pq kx")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    val scores = LangModel.nllScores(docs, uni, bi)
      .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(scores(99L) > scores(0L) + 1.0,
      s"gibberish ${scores(99L)} should far exceed boilerplate ${scores(0L)}")
  }

  test("documents with fewer than 2 tokens produce no score row") {
    val docs = Seq((1L, "ab cd"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(docs, $"text")
    val bi = LangModel.bigramCounts(docs, $"text")
    val ids = LangModel.nllScores(docs, uni, bi)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  // ---- interpolated Kneser-Ney ----

  /** Driver-side KN reference: same formulas, independent list-walk. */
  private def refKn(train: Seq[String], score: Seq[(Long, String)],
                    d: Double): Map[Long, (Long, Double)] = {
    def pairsOf(t: String): Seq[(String, String)] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      if (w.length < 2) Nil else w.zip(w.tail)
    }
    val bi = train.flatMap(pairsOf).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val ch = bi.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val n1p = bi.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nc = bi.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = bi.size.toDouble
    val v = nc.size.toDouble
    def pCont(w2: String): Double =
      (nc.getOrElse(w2, 0L) + 1.0) / (nTypes + v + 1.0)
    def prob(w1: String, w2: String): Double = ch.get(w1) match {
      case None => pCont(w2)
      case Some(h) =>
        math.max(bi.getOrElse((w1, w2), 0L) - d, 0.0) / h +
          (d * n1p(w1) / h) * pCont(w2)
    }
    score.flatMap { case (id, t) =>
      val ps = pairsOf(t)
      if (ps.isEmpty) None
      else Some(id -> (ps.size.toLong,
        ps.map { case (a, b) => -math.log(prob(a, b)) }.sum / ps.size))
    }.toMap
  }

  test("KN scores match the independent reference, incl. unseen histories") {
    val train = Seq("the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog")
    val score = Seq(
      (1L, "the cat sat"), (2L, "the dog ate"), // "dog ate" unseen pair
      (3L, "zz qq zz"))                          // fully unseen history
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val bi = LangModel.bigramCounts(trainDf, $"text")
    val got = LangModel.knNllScores(score.toDF("doc_id", "text"), bi)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = refKn(train, score, 0.75)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, nll)) =>
      assert(n == want(id)._1)
      assert(math.abs(nll - want(id)._2) < 1e-9, s"doc $id: $nll vs ${want(id)._2}")
    }
  }

  test("count pruning drops rare pairs; pruned pairs score via the unseen branch") {
    val train = Seq("a b a b a b", "c d")   // (a,b)x3, (b,a)x2, (c,d)x1
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val full = LangModel.bigramCounts(trainDf, $"text")
    val pruned = LangModel.bigramCounts(trainDf, $"text", minCount = 2L)
    assert(full.count() == 3 && pruned.count() == 2)
    // the pruned model is still a complete KN model: "c d" now takes
    // the unseen-history branch (c left the history table entirely),
    // and the score equals the independent reference computed over
    // the PRUNED table — pruning changes the model, not the math
    val score = Seq((1L, "c d")).toDF("doc_id", "text")
    val got = LangModel.knNllScores(score, pruned)
      .as[(Long, Long, Double)].head()
    val want = refKn(Seq("a b a b a b"), Seq((1L, "c d")), 0.75)
    assert(math.abs(got._3 - want(1L)._2) < 1e-9)
  }

  test("KN continuation: frequent single-context word gets less unseen mass") {
    // "francisco" appears 4 times but ONLY after "san"; "things"
    // appears twice after two different words. After an UNSEEN
    // history, KN must prefer "things" — add-k would prefer
    // "francisco" on raw frequency.
    val train = Seq("san francisco san francisco san francisco san francisco",
      "good things", "bad things")
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val bi = LangModel.bigramCounts(trainDf, $"text")
    val score = Seq((1L, "unseen francisco"), (2L, "unseen things"))
      .toDF("doc_id", "text")
    val nll = LangModel.knNllScores(score, bi)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(nll(2L) < nll(1L),
      s"KN must score multi-context 'things' (${nll(2L)}) more likely " +
        s"than single-context 'francisco' (${nll(1L)})")
  }
}
