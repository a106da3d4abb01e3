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
}
