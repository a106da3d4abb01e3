package graft.io

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class JsonlDocsSpec extends SparkTestBase {
  import spark.implicits._

  test("malformed lines are quarantined with the raw line, not dropped") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "source": "s0", "lang": "en", "text": "alpha"}
        |{"doc_id": 2, "source": "s0", "lang": "en", "text": "beta"}
        |{"doc_id": 3, "source": "s1", BROKEN JSON HERE
        |not json at all
        |{"doc_id": 4, "source": "s1", "lang": "de", "text": "gamma"}
        |""".stripMargin)
    val (clean, bad) = JsonlDocs.readSplit(spark, f.getAbsolutePath)
    assert(clean.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
    val rawLines = bad.as[String].collect().toSeq
    assert(rawLines.size == 2)
    assert(rawLines.exists(_.contains("BROKEN JSON HERE")))
    assert(rawLines.contains("not json at all"))
  }

  test("round trip: documents → jsonl → identical rows back") {
    val dir = Files.createTempDirectory("jsonl_rt").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"lang", $"text").limit(100)
    JsonlDocs.write(docs, dir)
    val (back, bad) = JsonlDocs.readSplit(spark, dir)
    assert(bad.count() == 0)
    val a = docs.orderBy($"doc_id").collect().toSeq
    val b = back.select($"doc_id", $"source", $"lang", $"text")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("gzipped JSONL reads transparently — quarantine flow included") {
    // corpora ship as .jsonl.gz; the text source must decompress and
    // the quarantine split must behave identically
    val dir = Files.createTempDirectory("jsonl_gz").toFile
    val f = new java.io.File(dir, "part.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f))
    out.write(
      """{"doc_id": 1, "source": "s0", "lang": "en", "text": "alpha"}
        |broken line
        |{"doc_id": 2, "source": "s0", "lang": "en", "text": "beta"}
        |""".stripMargin.getBytes("UTF-8"))
    out.close()
    val (clean, bad) = JsonlDocs.readSplit(spark, f.getAbsolutePath)
    assert(clean.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(bad.as[String].collect().toSeq == Seq("broken line"))
  }

  test("orc round trip preserves the documents schema and rows") {
    val dir = Files.createTempDirectory("orc_rt").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"lang", $"text").limit(100)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.orderBy($"doc_id").collect().toSeq ==
      docs.orderBy($"doc_id").collect().toSeq)
  }

  test("typed fields survive: wrong-typed value quarantines the line") {
    val dir = Files.createTempDirectory("jsonl_t").toFile
    val f = new java.io.File(dir, "part.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": "not a number", "source": "s0", "lang": "en", "text": "x"}
        |{"doc_id": 7, "source": "s0", "lang": "en", "text": "y"}
        |""".stripMargin)
    val (clean, bad) = JsonlDocs.readSplit(spark, f.getAbsolutePath)
    assert(clean.select($"doc_id").as[Long].collect().toSeq == Seq(7L))
    assert(bad.count() == 1)
  }
}
