package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("split assignment is deterministic and content-based") {
    val a = docs.withColumn("split", Splits.assignSplit($"text"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // same content → same split, regardless of partitioning or order
    val b = docs.repartition(7).orderBy($"doc_id".desc)
      .withColumn("split", Splits.assignSplit($"text"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("realized split fractions approximate the requested ones") {
    val counts = docs.withColumn("split", Splits.assignSplit($"text", 0.8, 0.1))
      .groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    // 500 docs: allow generous sampling noise around 80/10/10
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.08)
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.1) < 0.06)
    assert(math.abs(counts.getOrElse("test", 0L) / n - 0.1) < 0.06)
  }

  test("stratified sample hits per-stratum rates and is content-stable") {
    val thr = Splits.stratumThreshold($"source",
      Map("src0" -> 1.0, "src1" -> 0.5), defaultFrac = 0.0)
    val kept = docs.withColumn("keep", Splits.sampleHash($"text", thr))
    val rates = kept.groupBy($"source")
      .agg((sum(when($"keep", 1.0).otherwise(0.0)) / count(lit(1))).as("r"))
      .as[(String, Double)].collect().toMap
    assert(rates("src0") == 1.0)                    // frac 1.0 keeps all
    assert(math.abs(rates("src1") - 0.5) < 0.25)    // 25 docs: noisy but near
    assert(rates.filter(r => r._1 != "src0" && r._1 != "src1")
      .values.forall(_ == 0.0))                     // default 0 keeps none
    // same doc, same fate under repartition/order changes
    val a = kept.select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val b = docs.repartition(5).orderBy($"doc_id".desc)
      .withColumn("keep", Splits.sampleHash($"text", thr))
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(a == b)
  }

  test("appending new documents never reassigns existing ones") {
    val before = docs.withColumn("split", Splits.assignSplit($"text"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val appended = docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" fresh suffix")).as("text")))
    val after = appended.withColumn("split", Splits.assignSplit($"text"))
      .filter($"doc_id" < 100000)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(after == before)
  }

  test("token-budget sample respects per-stream quotas deterministically") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text")
    val budget = 2000L
    val streams = 4
    val kept = Splits.tokenBudgetSample(docs, budget, streams)
    // per-(source, stream) token totals never exceed the stream quota
    val over = kept.groupBy($"source", $"stream")
      .agg(sum($"n_tokens").as("tok"))
      .filter($"tok" > budget / streams)
    assert(over.count() == 0)
    // deterministic across runs
    val a = kept.select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Splits.tokenBudgetSample(docs, budget, streams)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // quota actually binds: the kept set is a strict subset
    assert(a.size < docs.count())
    // greedy prefix: any stream that EXCLUDED a doc is filled to
    // within one max-doc of its quota (max over ALL docs — the
    // excluded doc at the cut can be larger than any kept one)
    val maxDoc = docs
      .agg(max(TextFuncs.tokenCount($"text").cast("long"))).as[Long].head()
    val slack = docs
      .withColumn("stream", pmod($"doc_id", lit(streams)))
      .groupBy($"source", $"stream").agg(count(lit(1)).as("n_total"))
      .join(kept.groupBy($"source", $"stream")
        .agg(count(lit(1)).as("n_kept"), sum($"n_tokens").as("tok")),
        Seq("source", "stream"))
      .filter($"n_kept" < $"n_total" && $"tok" < budget / streams - maxDoc)
    assert(slack.count() == 0)
  }

  test("token-budget remainder spreads over streams instead of flooring away") {
    // 100 one-token docs, budget 3 over 8 streams: floor division alone
    // would give every stream quota 0 (silently empty); the remainder
    // spread gives streams 0-2 one token each → exactly 3 docs kept.
    val docs = (0L until 100L).map(i => (i, "g", s"w$i"))
      .toDF("doc_id", "source", "text")
    val kept = Splits.tokenBudgetSample(docs, budgetPerGroup = 3L, streams = 8)
    assert(kept.count() == 3)
    assert(kept.select($"stream").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // non-divisible budget: stream quotas sum to exactly the budget
    val kept2 = Splits.tokenBudgetSample(docs, budgetPerGroup = 11L, streams = 4)
    assert(kept2.agg(sum($"n_tokens")).as[Long].head() == 11L)
  }

  test("importance sampling: score 1 always keeps, 0 never, rate tracks score^alpha") {
    val docs = (0L until 2000L).map(i => (i, s"document body $i")).toDF("id", "text")
    def rate(score: Double, alpha: Double): Double =
      docs.filter(Splits.importanceKeep(lit(score), $"text", alpha))
        .count().toDouble / 2000.0
    assert(rate(1.0, 2.0) == 1.0)
    assert(rate(0.0, 2.0) == 0.0)
    val r5 = rate(0.5, 2.0) // expect ~0.25
    assert(math.abs(r5 - 0.25) < 0.05, s"keep rate $r5, expected ~0.25")
    assert(rate(0.5, 1.0) > r5, "flatter alpha must keep more")
    // deterministic: same inputs, same fates
    val a = docs.filter(Splits.importanceKeep(lit(0.5), $"text", 2.0))
      .select($"id").as[Long].collect().toSet
    val b = docs.filter(Splits.importanceKeep(lit(0.5), $"text", 2.0))
      .select($"id").as[Long].collect().toSet
    assert(a == b)
  }

  test("hostCapSample: per-host caps enforced, lottery deterministic, " +
      "under-cap hosts untouched") {
    val docs = (0L until 100L).map(i =>
        (i, if (i < 80) "mega.com" else s"small${i % 4}.com", s"text $i"))
      .toDF("doc_id", "host", "text")
    val capped = Splits.hostCapSample(docs, cap = 10)
    val byHost = capped.groupBy($"host").count()
      .as[(String, Long)].collect().toMap
    assert(byHost("mega.com") == 10) // capped
    assert(byHost.filterKeys(_ != "mega.com").values.forall(_ == 5),
      s"byHost=$byHost") // 20 docs over 4 small hosts, all kept
    // all columns ride through; survivors are a subset of the input
    assert(capped.columns.toSeq == docs.columns.toSeq)
    // deterministic under rerun and repartition
    val again = Splits.hostCapSample(docs.repartition(7), cap = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == capped.select($"doc_id").as[Long].collect().toSet)
    // the lottery is the md5 order, not "first N ids"
    val megaIds = capped.filter($"host" === "mega.com")
      .select($"doc_id").as[Long].collect().toSet
    assert(megaIds != (0L until 10L).toSet)
  }

  test("weightedSample: exact k, dominant weights always win, " +
      "non-positive weights never do, repartition/rerun-stable") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val docs = spark.range(0, 1000).toDF("doc_id")
      .withColumn("w",
        when(col("doc_id") < 5, lit(1e9))      // 5 overwhelming weights
          .otherwise(when(col("doc_id") === 999, lit(0.0)) // never wins
            .otherwise(lit(1.0))))
    val got = Splits.weightedSample(docs, col("w"), k = 20, seed = "s0")
    val ids = got.select($"doc_id").as[Long].collect().toSeq
    assert(ids.size == 20 && ids.distinct.size == 20)
    assert((0L until 5L).forall(ids.contains), s"dominant lost: $ids")
    assert(!ids.contains(999L))
    val again = Splits.weightedSample(docs.repartition(7), col("w"),
      k = 20, seed = "s0").select($"doc_id").as[Long].collect().toSeq
    assert(ids == again)
    // a different seed reshuffles the uniform-weight tail
    val other = Splits.weightedSample(docs, col("w"), k = 20,
      seed = "s1").select($"doc_id").as[Long].collect().toSeq
    assert(other.toSet != ids.toSet)
  }

  test("weightedSample replays the reference arithmetic exactly") {
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 500).toDF("doc_id")
      .withColumn("w", (col("doc_id") % 10 + 1).cast("double"))
    val got = Splits.weightedSample(docs, col("w"), k = 50, seed = "r0")
      .select($"doc_id", $"race_key").as[(Long, Double)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): Double = {
      val hex = md.digest(s"${id}r0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        281474976710656.0
      // Spark's Log expression evaluates via StrictMath (fdlibm) —
      // Math.log differs in the last ulp on some inputs
      -java.lang.StrictMath.log(u) / (id % 10 + 1).toDouble
    }
    val exp = (0L until 500L).map(i => (i, key(i)))
      .sortBy { case (i, kk) => (kk, i) }.take(50)
    assert(got == exp, s"first diff: ${got.zip(exp).find(p => p._1 != p._2)}")
  }

  test("weightedSamplePerGroup: exact k per group, group-local " +
      "winners unaffected by other groups, zero weights excluded") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val docs = spark.range(0, 300).toDF("doc_id")
      .withColumn("grp", (col("doc_id") % 3).cast("string"))
      .withColumn("w",
        when(col("doc_id") === 7, lit(0.0)).otherwise(lit(1.0)))
    val got = Splits.weightedSamplePerGroup(docs, col("w"), k = 10,
      seed = "g0", groupCol = "grp")
    val byGrp = got.select($"grp", $"doc_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGrp.keySet == Set("0", "1", "2"))
    assert(byGrp.values.forall(_.size == 10))
    assert(!byGrp.values.exists(_.contains(7L)))
    // group-local invariance: dropping group "2" entirely leaves the
    // winners of groups 0 and 1 bit-identical
    val fewer = Splits.weightedSamplePerGroup(
        docs.filter($"grp" =!= "2"), col("w"), k = 10,
        seed = "g0", groupCol = "grp")
      .select($"grp", $"doc_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fewer("0") == byGrp("0") && fewer("1") == byGrp("1"))
    // a group smaller than k keeps everything it has
    val tiny = Splits.weightedSamplePerGroup(
      docs.filter($"doc_id" < 5), col("w"), k = 10,
      seed = "g0", groupCol = "grp")
    assert(tiny.count() == 5)
  }

  test("weightedSamplePerGroup fails LOUDLY on duplicate ids instead " +
      "of silently multiplying join-back rows") {
    import org.apache.spark.sql.functions.{col, lit}
    val dup = spark.range(0, 40).toDF("doc_id")
      .withColumn("grp", lit("a"))
      .withColumn("w", lit(1.0))
    val docs = dup.unionByName(dup.filter($"doc_id" === 3)) // id 3 twice
    val ex = intercept[Exception] {
      Splits.weightedSamplePerGroup(docs, col("w"), k = 40,
        seed = "g0", groupCol = "grp").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("duplicate doc_id")),
      s"got: ${msgs(ex).mkString(" | ")}")
    // unique ids on the same plan shape stay clean
    assert(Splits.weightedSamplePerGroup(dup, col("w"), k = 40,
      seed = "g0", groupCol = "grp").count() == 40L)
  }

  test("splitByCluster: near-dup neighbors never straddle a split " +
    "boundary (the leakage a plain content-hash split allows)") {
    val edges = Dedup.minhashPairs(docs, threshold = 0.7)
      .select($"id_a", $"id_b")
    val out = Splits.splitByCluster(docs, edges)
    assert(out.count() == docs.count())

    // every component maps to exactly ONE split
    val maxSplitsPerComp = out.groupBy($"component")
      .agg(countDistinct($"split").as("k"))
      .agg(max($"k")).as[Long].head()
    assert(maxSplitsPerComp == 1L)

    // therefore zero edges straddle splits
    def straddles(assign: org.apache.spark.sql.DataFrame): Long = edges
      .join(assign.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(assign.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb").count()
    assert(straddles(out.select($"doc_id", $"split")) == 0L)

    // ...which the plain content-hash split does NOT guarantee: near
    // dups have DIFFERENT text, so they draw independent buckets and
    // some pair straddles on this corpus (the leakage being fixed)
    val plain = docs
      .withColumn("split", Splits.assignSplit($"text"))
      .select($"doc_id", $"split")
    assert(straddles(plain) > 0L)

    // singletons (no edge) key on their own id — and the whole
    // assignment is repartition/order stable
    val inEdges = edges.select($"id_a".as("doc_id"))
      .unionByName(edges.select($"id_b".as("doc_id"))).distinct()
    val singleton = out.join(inEdges, Seq("doc_id"), "left_anti")
    assert(singleton.filter($"component" =!= $"doc_id").count() == 0L)
    val a = out.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val b = Splits.splitByCluster(docs.repartition(7), edges.repartition(3))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("rendezvousShard: minimal movement on fleet growth, to the " +
    "new shard only; balanced; seeded; repartition-stable") {
    val key = $"doc_id".cast("string")
    val assigned = docs.select($"doc_id",
        Splits.rendezvousShard(key, 8, "s").as("s8"),
        Splits.rendezvousShard(key, 9, "s").as("s9"),
        Splits.rendezvousShard(key, 8, "other").as("s8o"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3)))

    // THE rendezvous property, exact: a doc that moves under 8→9
    // growth moves to shard 8 (the added one) — argmax over a
    // superset differs only when the new element wins
    val moved = assigned.filter(t => t._2 != t._3)
    assert(moved.nonEmpty && moved.forall(_._3 == 8))
    // expected movement 1/9 of docs; generous band for a small corpus
    val frac = moved.length.toDouble / assigned.length
    assert(frac > 0.03 && frac < 0.25, s"moved fraction $frac")

    // balance: each of the 8 shards holds between half and double the
    // uniform share (md5 weights are uniform)
    val byShard = assigned.groupBy(_._2).view.mapValues(_.size)
    assert(byShard.keys.toSet == (0 until 8).toSet)
    val share = assigned.length / 8.0
    byShard.values.foreach(n => assert(n > share / 2 && n < share * 2))

    // a different seed is a different (but equally valid) placement
    assert(assigned.exists(t => t._2 != t._4))

    // pure function of content: repartitioning changes nothing
    val again = docs.repartition(7).select($"doc_id",
        Splits.rendezvousShard(key, 8, "s").as("s8"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assigned.foreach(t => assert(again(t._1) == t._2))
  }
}
