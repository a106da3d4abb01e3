package graft.llmops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Misra-Gries heavy hitters + KMV bottom-k sketch. The interesting
  * properties are the ones the q106/q107 contracts lean on: MG's
  * no-overcount / bounded-undercount / heavy-completeness guarantees
  * under partial aggregation and merges; KMV's exactness below k,
  * determinism under repartitioning, and a sane Jaccard estimate on a
  * planted overlap.
  */
class FreqSpec extends SparkTestBase {
  import spark.implicits._

  test("MG is exact when distinct items fit in k") {
    val items = Seq("a", "a", "b", "c", "c", "c").toDF("item")
      .repartition(3)
    val out = items.agg(Freq.freqItems($"item", 8).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("MG eval orders by estimate desc then item asc") {
    val items = Seq("b", "b", "a", "a", "c").toDF("item")
    val out = items.agg(Freq.freqItems($"item", 8).as("s"))
      .select($"s.item".as("i")).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("MG guarantees hold on a skewed stream under merges") {
    // Zipf-ish: item j appears floor(n0/j) times, shuffled across
    // partitions so partial-agg merges really exercise the offset rule
    val n0 = 600
    val rows = (1 to 60).flatMap(j => Seq.fill(n0 / j)(j.toString))
    val n = rows.size.toDouble
    val k = 8
    val exact = rows.groupBy(identity).map { case (i, v) => (i, v.size.toLong) }
    val items = rows.toDF("item").repartition(7, $"item")
    val est = items.agg(Freq.freqItems($"item", k).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    val bound = n / (k + 1)
    est.foreach { case (i, e) =>
      val ex = exact(i)
      assert(e <= ex, s"overcount on $i")
      assert(e >= ex - bound, s"undercount beyond n/(k+1) on $i")
    }
    exact.foreach { case (i, ex) =>
      if (ex > bound)
        assert(est.contains(i), s"heavy item $i (count $ex > $bound) missing")
    }
  }

  test("MG ignores nulls and handles the empty frame") {
    val items = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val out = items.agg(Freq.freqItems($"item", 4).as("s"))
      .select(explode($"s").as("e")).select($"e.est").as[Long].head()
    assert(out === 2L)
    val empty = items.filter($"item" === "zzz")
      .agg(Freq.freqItems($"item", 4).as("s"))
      .select(size($"s")).as[Int].head()
    assert(empty === 0)
  }

  test("freq_items is callable from SQL") {
    Seq("x", "x", "y").toDF("item").createOrReplaceTempView("freq_in")
    val out = spark.sql(
      "SELECT freq_items(item, 4) AS s FROM freq_in")
      .select(expr("s[0].item"), expr("s[0].est"))
      .as[(String, Long)].head()
    assert(out === ("x", 2L))
  }

  test("KMV is the exact distinct set when it fits in k") {
    val df = Seq(5L, 1L, 3L, 1L, 5L, -7L).toDF("h").repartition(3)
    val out = df.agg(Freq.kmvSketch($"h", 16).as("s"))
      .select($"s").as[Seq[Long]].head()
    assert(out === Seq(-7L, 1L, 3L, 5L))
  }

  test("KMV keeps the k smallest distinct, independent of partitioning") {
    val vals = (1L to 500L).map(v => v * 7919L % 1009L)
    val expected = vals.distinct.sorted.take(32)
    Seq(1, 4, 13).foreach { p =>
      val out = vals.toDF("h").repartition(p)
        .agg(Freq.kmvSketch($"h", 32).as("s"))
        .select($"s").as[Seq[Long]].head()
      assert(out === expected, s"partitions=$p")
    }
  }

  test("KMV Jaccard estimates a planted overlap and is exact below k") {
    // |A|=300, |B|=300, |A∩B|=100 → J = 0.2
    val a = (1 to 300).map(i => s"doc$i")
    val b = (201 to 500).map(i => s"doc$i")
    def sketch(xs: Seq[String], k: Int) =
      xs.toDF("t").agg(Freq.kmvSketch(xxhash64($"t"), k).as("s"))
    val est = sketch(a, 128).crossJoin(
        sketch(b, 128).withColumnRenamed("s", "s2"))
      .select(Freq.kmvJaccard($"s", $"s2", 128)).as[Double].head()
    assert(math.abs(est - 0.2) < 0.12, s"est $est")
    // k=1024 > |A∪B|=500: estimator degenerates to the exact Jaccard
    val exact = sketch(a, 1024).crossJoin(
        sketch(b, 1024).withColumnRenamed("s", "s2"))
      .select(Freq.kmvJaccard($"s", $"s2", 1024)).as[Double].head()
    assert(exact === 100.0 / 500.0)
  }

  test("kmv_sketch is callable from SQL") {
    Seq(9L, 2L, 2L).toDF("h").createOrReplaceTempView("kmv_in")
    val out = spark.sql("SELECT kmv_sketch(h, 4) AS s FROM kmv_in")
      .select($"s").as[Seq[Long]].head()
    assert(out === Seq(2L, 9L))
  }

  test("KMV Jaccard of two empty sketches is a defined 0.0, not an error") {
    // empty/all-null corpora → empty sketches → union size 0; under
    // ANSI mode an unguarded division would throw DIVIDE_BY_ZERO
    val empty = Seq.empty[Long].toDF("h")
      .agg(Freq.kmvSketch($"h", 16).as("s"))
    val j = empty.crossJoin(empty.withColumnRenamed("s", "s2"))
      .select(Freq.kmvJaccard($"s", $"s2", 16)).as[Double].head()
    assert(j === 0.0)
  }

  test("Count-Min: exact recovery for a tiny universe, never " +
      "undercounts under width pressure, shard merge equals the " +
      "whole, null probes return null") {
    import graft.llmops.Freq
    val items = Seq.tabulate(3000)(i => s"item${i % 7}").toDF("t")
    // 7 distinct items, width 64, depth 4: the chance all 4 rows
    // collide for any pair is nil on this fixed hash — estimates are
    // EXACT, asserted as equality
    val sk = items.agg(Freq.cmSketch($"t", 4, 64).as("sk")).cache()
    val probes = (0 until 7).map(i => s"item$i") :+ "absent"
    val ests = probes.toDF("t").crossJoin(broadcast(sk))
      .select($"t", Freq.cmEstimate($"sk", $"t", 4, 64).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy($"t").count()
      .as[(String, Long)].collect().toMap
    probes.dropRight(1).foreach { t =>
      assert(ests(t) == exact(t), s"$t: est ${ests(t)} != ${exact(t)}")
    }
    assert(ests("absent") >= 0)
    // a NULL probe is not an item: the estimate is null, never a
    // spurious bucket sum
    val nullEst = Seq(Option.empty[String]).toDF("t")
      .crossJoin(broadcast(sk))
      .select(Freq.cmEstimate($"sk", $"t", 4, 64)).collect()(0)
    assert(nullEst.isNullAt(0))
    // deliberately narrow sketch: estimates still never undercount
    val tight = items.agg(Freq.cmSketch($"t", 2, 3).as("sk"))
    val tightEsts = probes.dropRight(1).toDF("t")
      .crossJoin(broadcast(tight))
      .select($"t", Freq.cmEstimate($"sk", $"t", 2, 3).as("est"))
      .as[(String, Long)].collect().toMap
    probes.dropRight(1).foreach { t =>
      assert(tightEsts(t) >= exact(t), s"$t undercounted under pressure")
    }
    // shard merge = whole-corpus sketch, cell for cell
    val h1 = Seq.tabulate(1500)(i => s"item${i % 7}").toDF("t")
      .agg(Freq.cmSketch($"t", 4, 64)).as[Seq[Long]].head()
    val h2 = Seq.tabulate(1500)(i => s"item${(i + 1500) % 7}").toDF("t")
      .agg(Freq.cmSketch($"t", 4, 64)).as[Seq[Long]].head()
    val whole = Seq.tabulate(3000)(i => s"item${i % 7}").toDF("t")
      .agg(Freq.cmSketch($"t", 4, 64)).as[Seq[Long]].head()
    assert(Freq.mergeCmSketches(h1, h2, 4, 64) == whole)
    // a (depth, width) claim that disagrees with the cell count is an
    // error, not silent garbage (same-TOTAL different-shape is
    // undetectable from a flat array — the scaladoc owns that caveat)
    intercept[IllegalArgumentException] {
      Freq.mergeCmSketches(h1, h2, 2, 100)
    }
  }

  test("SQL builders reject a non-numeric literal k with the intended message") {
    Seq("a").toDF("item").createOrReplaceTempView("fi_in")
    val e1 = intercept[Exception] {
      spark.sql("SELECT freq_items(item, 'four') FROM fi_in").collect()
    }
    assert(e1.getMessage.contains("literal non-null numeric k"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(xxhash64(item), 'four') FROM fi_in").collect()
    }
    assert(e2.getMessage.contains("literal non-null numeric k"),
      s"got: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      spark.sql("SELECT collect_top_k(item, 1.0, 'four') FROM fi_in").collect()
    }
    assert(e3.getMessage.contains("literal non-null numeric k"),
      s"got: ${e3.getMessage}")
  }
}
