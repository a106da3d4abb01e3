package graft.ops

import java.nio.file.Files

import graft.{SparkTestBase, Tables}

class OutputSpec extends SparkTestBase {

  test("file count tracks data volume, not the shuffle-partition setting") {
    // inflate the corpus so the size estimate clears 1 MB comfortably
    val docs = Tables.documents(spark, sf0001)
      .crossJoin(spark.range(40).toDF("copy"))
    val small = Output.sizedForWrite(docs, targetMB = 1)
    val big = Output.sizedForWrite(docs, targetMB = 10240)
    assert(big.rdd.getNumPartitions == 1)
    assert(small.rdd.getNumPartitions > big.rdd.getNumPartitions)

    val dir = Files.createTempDirectory("graft-sized").resolve("out").toString
    big.write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected one sized file, got ${files.length}")
  }

  test("row identity is preserved by the resize") {
    val docs = Tables.documents(spark, sf0001)
    assert(Output.sizedForWrite(docs, 1).count() == docs.count())
  }

  test("zorderValue: closed-form interleave and monotone containment") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Output.zorderValue($"a", $"b", 16))
      .as[Long].collect().toSeq
    // bit i of a → position 2i, of b → 2i+1:
    // z(3,5): a=011 → bits 0,2; b=101 → bits 1,5 → 100111b = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
    // out-of-range inputs clamp instead of corrupting neighbors
    val clamped = Seq((-5L, 70000L)).toDF("a", "b")
      .select(Output.zorderValue($"a", $"b", 16)).as[Long].head()
    assert(clamped == Seq((0L, 65535L)).toDF("a", "b")
      .select(Output.zorderValue($"a", $"b", 16)).as[Long].head())
  }

  test("z-order layout prunes file reads on BOTH dimensions where a " +
    "single-column sort prunes only its own") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two independent uniform dims — the worst case for a linear sort
    val n = 20000
    val df = spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(256))).as("x"),
      (pmod(xxhash64(col("id"), lit(2)), lit(256))).as("y"))
    val nFiles = 16

    def filesHit(dir: String, probeCol: String, lo: Int, hi: Int): Int = {
      // per-file min/max of the probe column — what parquet row-group
      // stats give a reader; a file counts if its range intersects
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(probeCol)), max(col(probeCol))).head()
        r.getLong(1) >= lo && r.getLong(0) <= hi
      }
    }

    val base = Files.createTempDirectory("graft-zorder")
    val zDir = base.resolve("z").toString
    val xDir = base.resolve("x").toString
    // Two determinism levers, both load-independent: (a) exhaustive
    // boundary sampling — repartitionByRange's default 100-rows-per-
    // partition sample made cut points (and so the per-file
    // z-rectangles this test measures) wobble run to run; (b)
    // alignFiles — population-quantile cuts land mid-quadrant, so a
    // boundary file straddles two Morton rectangles and its y-range
    // widens past the bound. Aligned cuts give every file exactly one
    // rectangle: the pruning count below is EXACT, not a tolerance.
    val sampleConf = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(sampleConf)
    spark.conf.set(sampleConf, n.toString)
    try {
      Output.zorderLayout(df, $"x", $"y", nFiles, bits = 8,
          alignFiles = true)
        .write.mode("overwrite").parquet(zDir)
      df.repartitionByRange(nFiles, $"x").sortWithinPartitions($"x")
        .write.mode("overwrite").parquet(xDir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(sampleConf, v)
        case None => spark.conf.unset(sampleConf)
      }
    }

    // probe a narrow y-range: the x-sorted layout scatters y uniformly
    // across every file; the z-order layout confines it
    val zHit = filesHit(zDir, "y", 100, 115)
    val xHit = filesHit(xDir, "y", 100, 115)
    assert(xHit >= nFiles - 1, s"x-sorted layout unexpectedly pruned y: $xHit")
    // aligned layout: the probe's (y7, y6) quadrant is exactly 4 of
    // the 16 rectangles — an exact count, not a tolerance band
    assert(zHit == nFiles / 4,
      s"z-order should confine a 1/16 y-slice to exactly 4 files, hit $zHit")
    // ...and symmetrically for x probes (x-sort is optimal at 1-2)
    assert(filesHit(zDir, "x", 100, 115) == nFiles / 4)
    // and the layout is only a layout: same rows
    assert(spark.read.parquet(zDir).count() == n)
  }
}
