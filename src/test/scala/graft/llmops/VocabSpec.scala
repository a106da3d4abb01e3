package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: word counts → frequency-weighted char pairs. */
  private def naive(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def run(texts: Seq[String]): Map[String, Long] =
    Vocab.bpePairCounts(texts.toDF("text"), $"text")
      .as[(String, Long)].collect().toMap

  test("pair counts match a driver-side BPE merge round") {
    val texts = Seq("Spark spark batch", "batch line  spark", "  shuffle  ")
    assert(run(texts) == naive(texts))
  }

  test("single-char words and empty tokens contribute nothing") {
    assert(run(Seq("a b c", " x ")) == Map.empty[String, Long])
    assert(run(Seq("a bc a")) == Map("bc" -> 1L))
  }

  test("counts weight by corpus frequency, not document presence") {
    // "zz" appears 3 times in one doc and once in another -> cnt 4
    assert(run(Seq("zz zz zz", "zz"))("zz") == 4L)
  }

  test("agrees with a full driver replay on the real table") {
    val texts = Tables.documents(spark, sf0001)
      .select($"text").as[String].collect().toSeq
    assert(run(texts) == naive(texts))
  }

  // ---- full BPE training + encode ----

  /** Independent driver-side BPE trainer (list-walk merges, no regex):
    * same semantics as the distributed trainer — count weighted
    * adjacent pairs, merge ALL non-overlapping occurrences of the
    * (count desc, pair asc) argmax each round.
    */
  private def refTrain(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var dict: Map[Vector[String], Long] =
      texts.flatMap(_.trim.toLowerCase.split("\\s+"))
        .filter(_.length >= 2)
        .groupBy(identity).view.mapValues(_.size.toLong)
        .map { case (w, c) => w.map(_.toString).toVector -> c }.toMap
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (l, r) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a + "\u0001" + b) }._1
        merges += ((l, r))
        dict = dict.toSeq.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2  // left-to-right, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        round += 1
      }
    }
    merges.result()
  }

  /** Independent driver-side encoder: rank-priority merging. */
  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    text.trim.toLowerCase.split("\\s+").toSeq.flatMap { w =>
      var syms = w.map(_.toString).toVector
      var go = true
      while (go && syms.length > 1) {
        val cands = syms.indices.dropRight(1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          syms = syms.patch(i, Seq(syms(i) + syms(i + 1)), 2)
        }
      }
      syms
    }
  }

  test("trainBpe matches the independent reference on the classic corpus") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest widest widest")
    val got = Vocab.trainBpe(texts.toDF("text"), $"text", 8)
    assert(got == refTrain(texts, 8))
  }

  test("trainBpe matches the reference on real documents") {
    val docs = Tables.documents(spark, sf0001).limit(50).cache()
    val texts = docs.select($"text").as[String].collect().toSeq
    assert(Vocab.trainBpe(docs, $"text", 10) == refTrain(texts, 10))
  }

  test("trainBpe stops early when no pairs remain") {
    val merges = Vocab.trainBpe(Seq("ab ab").toDF("text"), $"text", 10)
    assert(merges == Seq(("a", "b"))) // after merging "ab" no pair is left
  }

  test("bpe_encode applies merges by rank and matches the reference") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = Seq(Tuple1("Low lowly unknown"))
      .toDF("text")
      .select(Vocab.bpe_encode($"text", merges).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("low", "low", "l", "y",
      "u", "n", "k", "n", "o", "w", "n"))
    assert(got == refEncode("Low lowly unknown", merges))
  }

  test("round trip: encoding with trained merges compresses the corpus") {
    val docs = Tables.documents(spark, sf0001).limit(100).cache()
    val merges = Vocab.trainBpe(docs, $"text", 30)
    val texts = docs.select($"text").as[String].collect().toSeq
    val counts = docs
      .select(size(Vocab.bpe_encode($"text", merges)).as("n_bpe"),
        size(split(lower(trim($"text")), "\\s+")).as("n_words"),
        length(regexp_replace($"text", "\\s+", "")).as("n_chars"))
      .agg(sum($"n_bpe"), sum($"n_words"), sum($"n_chars"))
      .head()
    val (nBpe, nWords, nChars) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    assert(nBpe < nChars, "BPE must compress below character count")
    assert(nBpe > nWords, "30 merges cannot reach word-level tokens")
    // kernel agrees with the reference encoder on every document
    texts.take(20).foreach { t =>
      val k = Seq(Tuple1(t)).toDF("text")
        .select(Vocab.bpe_encode($"text", merges).as("x"))
        .head().getSeq[String](0)
      assert(k == refEncode(t, merges), s"mismatch on: ${t.take(40)}")
    }
  }

  // ---- unigram-LM tokenizer (seed → Viterbi encode → hard-EM train) ----

  /** Independent driver-side Viterbi segmenter: memoized recursion
    * (a deliberately different shape from the kernel's iterative DP),
    * same semantics — longer piece wins score ties, unknown chars
    * fall back to UnkLogProb singletons.
    */
  private def refSegment(word: String, logp: Map[String, Double],
                         maxLen: Int): Seq[String] = {
    val memo = scala.collection.mutable.Map.empty[Int, (Double, Int)]
    def best(i: Int): (Double, Int) = // (score, winning piece length)
      if (i == 0) (0.0, 0)
      else memo.getOrElseUpdate(i, {
        (1 to math.min(maxLen, i)).foldLeft((Double.NegativeInfinity, 1)) {
          case (acc @ (bs, bl), l) =>
            val piece = word.substring(i - l, i)
            val sc = logp.get(piece) match {
              case Some(p) => best(i - l)._1 + p
              case None if l == 1 => best(i - 1)._1 + Vocab.UnkLogProb
              case None => Double.NegativeInfinity
            }
            if (sc > bs || (sc == bs && l > bl)) (sc, l) else acc
        }
      })
    val out = List.newBuilder[String]
    var stack = List.empty[String]
    var j = word.length
    while (j > 0) {
      val l = best(j)._2
      stack = word.substring(j - l, j) :: stack
      j -= l
    }
    stack
  }

  private def refEncodeUni(text: String, logp: Map[String, Double],
                           maxLen: Int): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap(refSegment(_, logp, maxLen))

  test("unigram seed counts match a driver-side substring walk") {
    val texts = Seq("Spark spark ab", "a  spark", "  b  ")
    val naive = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .flatMap { case (w, c) =>
        for { i <- 0 until w.length
              l <- 1 to math.min(3, w.length - i) }
          yield w.substring(i, i + l) -> c
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Vocab.unigramSeedCounts(texts.toDF("text"), $"text", maxLen = 3)
      .as[(String, Long)].collect().toMap
    assert(got == naive)
  }

  test("unigram_encode is max-likelihood and matches the reference DP") {
    // "abc": cover {ab,c} = -1-3 = -4 beats {a,bc} = -2-3 = -5 and
    // {abc} absent; ties prefer the longer piece
    val logp = Seq("a" -> -2.0, "b" -> -3.0, "c" -> -3.0, "ab" -> -1.0,
      "bc" -> -3.0, "abcd" -> -9.0)
    val got = Seq(Tuple1("abc ABCD zq"))
      .toDF("text")
      .select(Vocab.unigram_encode($"text", logp, maxLen = 4).as("x"))
      .head().getSeq[String](0)
    assert(got == Seq("ab", "c", "abcd", "z", "q")) // z,q: unknown-char fallback
    assert(got == refEncodeUni("abc ABCD zq", logp.toMap, 4))
  }

  test("unigram_encode matches the reference DP on real documents") {
    val docs = Tables.documents(spark, sf0001).limit(60).cache()
    val vocab = Vocab.trainUnigram(docs, $"text", vocabSize = 150,
      iters = 3, maxPieceLen = 4, seedSize = 400)
    val logp = vocab.toMap
    val texts = docs.select($"text").as[String].collect().toSeq
    val kernel = docs
      .select($"text", Vocab.unigram_encode($"text", vocab, 4).as("x"))
      .as[(String, Seq[String])].collect()
    kernel.foreach { case (t, pieces) =>
      assert(pieces == refEncodeUni(t, logp, 4), s"mismatch on: ${t.take(40)}")
      // lossless cover: pieces concatenate back to the tokenized text
      assert(pieces.mkString ==
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString)
    }
  }

  test("trainUnigram respects the vocab budget and keeps char coverage") {
    val docs = Tables.documents(spark, sf0001).limit(80).cache()
    val vocabSize = 120
    val vocab = Vocab.trainUnigram(docs, $"text", vocabSize,
      iters = 3, maxPieceLen = 4, seedSize = 300)
    val pieces = vocab.map(_._1)
    val chars = docs.select($"text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+")).flatMap(_.toSeq)
      .map(_.toString).toSet
    assert(chars.subsetOf(pieces.filter(_.length == 1).toSet),
      "every corpus character must stay in the vocabulary")
    assert(pieces.size == math.max(vocabSize, chars.size))
    assert(pieces.distinct.size == pieces.size)
    // deterministic: retraining reproduces the table bit-for-bit
    val again = Vocab.trainUnigram(docs, $"text", vocabSize,
      iters = 3, maxPieceLen = 4, seedSize = 300)
    assert(again == vocab)
  }

  test("trained unigram compresses below characters, like BPE") {
    val docs = Tables.documents(spark, sf0001).limit(100).cache()
    val vocab = Vocab.trainUnigram(docs, $"text", vocabSize = 200,
      iters = 3, maxPieceLen = 4, seedSize = 600)
    val counts = docs
      .select(size(Vocab.unigram_encode($"text", vocab, 4)).as("n_uni"),
        size(split(lower(trim($"text")), "\\s+")).as("n_words"),
        length(regexp_replace($"text", "\\s+", "")).as("n_chars"))
      .agg(sum($"n_uni"), sum($"n_words"), sum($"n_chars")).head()
    val (nUni, nWords, nChars) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    assert(nUni < nChars, "unigram must compress below character count")
    assert(nUni > nWords, "a 200-piece vocab cannot reach word-level tokens")
  }

  test("coverageStats: exact token/type masses per group, OOV split") {
    val docs = Seq(
      ("a", "the cat the cat sat"),   // tokens: the×2 cat×2 sat×1
      ("a", "the dog"),               // the, dog
      ("b", "zap zap zoom")           // zap×2 zoom×1
    ).toDF("source", "text")
    val vocab = Seq("the", "cat", "zap", "zap").toDF("token") // dup ok
    val got = Vocab.coverageStats(docs, vocab, $"text", "source")
      .orderBy($"source")
      .select($"source", $"n_tokens", $"n_types", $"oov_tokens",
        $"oov_types", $"oov_token_rate")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // a: 7 tokens {the×3 cat×2 sat dog}, 4 types; oov = sat+dog
    // b: 3 tokens {zap×2 zoom}, 2 types; oov = zoom
    assert(got == Seq(
      ("a", 7L, 4L, 2L, 2L, 2.0 / 7),
      ("b", 3L, 2L, 1L, 1L, 1.0 / 3)), s"got=$got")
  }

  test("coverageStats: unspaced CJK text counts one token per " +
      "ideograph (script-aware seam), not one giant token") {
    val docs = Seq(("zh", "数据数据好")).toDF("source", "text")
    val vocab = Seq("数", "据").toDF("token")
    val got = Vocab.coverageStats(docs, vocab, $"text", "source")
      .select($"n_tokens", $"n_types", $"oov_tokens")
      .as[(Long, Long, Long)].head()
    // tokens: 数×2 据×2 好×1 → 5 tokens, 3 types, 好 is the one OOV
    assert(got == ((5L, 3L, 1L)))
  }

  test("coverageStats: empty vocab marks everything OOV; full vocab " +
      "marks nothing; repartition-stable") {
    val docs = Seq(("a", "x y"), ("b", "x")).toDF("source", "text")
    val none = Vocab.coverageStats(docs,
        Seq.empty[String].toDF("token"), $"text", "source")
      .select($"oov_token_rate").as[Double].collect().toSeq
    assert(none == Seq(1.0, 1.0))
    val full = Vocab.coverageStats(docs,
        Seq("x", "y").toDF("token"), $"text", "source")
      .select($"oov_tokens").as[Long].collect().toSeq
    assert(full == Seq(0L, 0L))
    val big = spark.read.parquet(s"$sf0001/documents.parquet")
    val v = Seq("the", "and", "of").toDF("token")
    val a = Vocab.coverageStats(big, v, $"text", "source")
      .collect().map(_.toSeq).toSet
    val b = Vocab.coverageStats(big.repartition(7), v, $"text", "source")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("heapsProfile: vocab grows sublinearly on natural-ish text and " +
      "beta reflects it; checkpoints nest") {
    import spark.implicits._
    val docs = (0 until 64).map { i =>
      (i.toLong, (0 until 50).map(k =>
        s"w${(i * 53 + k * k) % 700}").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Vocab.heapsProfile(docs)
      .collect().sortBy(_.getAs[Double]("fraction"))
    assert(rows.length == 4)
    val vocabs = rows.map(_.getAs[Long]("vocab"))
    val tokens = rows.map(_.getAs[Long]("n_tokens"))
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b })
    assert(tokens.zip(tokens.tail).forall { case (a, b) => a < b })
    val beta = rows.last.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0, s"beta=$beta")
    // first checkpoint is its own fit base: beta 0 by definition
    assert(rows.head.getAs[Double]("beta") == 0.0)
  }

  test("heapsProfile: the single-scan conditional-aggregate shape " +
      "equals the naive per-fraction rescan, fraction by fraction") {
    import spark.implicits._
    // empty-text doc (id 3) and a null text (id 7): docs with no
    // tokens must not count toward n_docs at any fraction
    val docs = (0 until 40).map { i =>
      val text =
        if (i == 3) ""
        else if (i == 7) null
        else (0 until 20).map(k => s"w${(i * 31 + k * 3) % 150}")
          .mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val fractions = Seq(0.2, 0.5, 0.9, 1.0)
    val got = Vocab.heapsProfile(docs, fractions)
      .collect().map(r => r.getAs[Double]("fraction") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("vocab"))).toMap
    // naive reference: re-filter and re-tokenize per fraction
    val maxId = 39L
    fractions.foreach { f =>
      val cut = math.ceil((maxId + 1) * f).toLong
      val ref = docs.filter($"doc_id" < cut)
        .select(explode(graft.llmops.TextFuncs.tokens($"text")).as("t"),
          $"doc_id")
        .filter($"t" =!= "")
        .agg(countDistinct($"doc_id"), count(lit(1)),
          countDistinct($"t")).head()
      assert(got(f) == ((ref.getLong(0), ref.getLong(1),
        ref.getLong(2))), s"fraction $f")
    }
  }

  test("burstinessReport: a clumped term out-scores a scattered one " +
      "at equal total count; moments are exact with zeros") {
    import spark.implicits._
    // 10 docs; "bursty" appears 9 times in ONE doc, "spread" once in
    // each of 9 docs — same total_tf 9, same df gate passes spread
    // only if minDf allows; use minDf 1 to see both
    val docs = (0 until 10).map { i =>
      val bursty = if (i == 0) Array.fill(9)("bursty").mkString(" ") else ""
      val spread = if (i < 9) "spread" else ""
      (i.toLong, s"filler$i $bursty $spread".trim)
    }.toDF("doc_id", "text")
    val got = Vocab.burstinessReport(docs, k = 50, minDf = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val b = got("bursty"); val s = got("spread")
    assert(b.getAs[Long]("df") == 1L && b.getAs[Long]("total_tf") == 9L)
    assert(s.getAs[Long]("df") == 9L && s.getAs[Long]("total_tf") == 9L)
    // exact moments over N=10 incl zeros:
    // bursty: mean .9, E[x2] 8.1, var 7.29, vmr 8.1
    // spread: mean .9, E[x2] .9,  var .09, vmr .1
    assert(b.getAs[Double]("vmr") == 8.1, b.toString)
    assert(s.getAs[Double]("vmr") == 0.1, s.toString)
    assert(b.getAs[Double]("mean_tf") == 0.9)
    // empty input guard
    val e = intercept[IllegalArgumentException] {
      Vocab.burstinessReport(
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("no documents"))
  }

  test("goodTuringReport: unseen mass = singletons over tokens; an " +
      "all-repeats source reports zero unseen mass") {
    import spark.implicits._
    val df = Seq(
      // source a: tokens = the the cat sat cat mat -> counts:
      // the 2, cat 2, sat 1, mat 1 => N=6 V=4 N1=2 N2=2
      ("a", "the the cat"), ("a", "sat cat mat"),
      // source b: every token seen twice => N1=0, discount null
      ("b", "x y x y")).toDF("source", "text")
    val got = Vocab.goodTuringReport(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_tokens") == 6L)
    assert(a.getAs[Long]("vocab") == 4L)
    assert(a.getAs[Long]("singletons") == 2L)
    assert(a.getAs[Long]("doubletons") == 2L)
    assert(a.getAs[Double]("unseen_mass") == 0.3333)
    assert(a.getAs[Double]("singleton_share") == 0.5)
    assert(a.getAs[Double]("gt_singleton_discount") == 2.0)
    val b = got("b")
    assert(b.getAs[Double]("unseen_mass") == 0.0)
    assert(b.isNullAt(b.fieldIndex("gt_singleton_discount")))
  }
}
