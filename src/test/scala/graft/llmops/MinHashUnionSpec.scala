package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class MinHashUnionSpec extends SparkTestBase {
  import spark.implicits._

  test("group union signature equals kernel union of member signatures") {
    val docs = Tables.documents(spark, sf0001).limit(100)
      .select($"source", $"doc_id",
        Sketches.minhash_signature($"text", 5, 64).as("sig"))
      .cache()
    val grouped = docs.groupBy($"source")
      .agg(MinHashUnion.agg($"sig", 64).as("union_sig"))
      .as[(String, Seq[Long])].collect().toMap

    val manual = docs.as[(String, Long, Seq[Long])].collect()
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.map(_._3).reduce((a, b) =>
          a.zip(b).map { case (x, y) => math.min(x, y) })
      }
    assert(grouped.keySet == manual.keySet)
    for ((src, sig) <- manual) assert(grouped(src) == sig, s"source $src")
  }

  test("union signature similarity reflects shared content") {
    // corpus A and corpus B share half their documents
    val docs = Tables.documents(spark, sf0001).limit(40)
      .select($"doc_id", Sketches.minhash_signature($"text", 5, 128).as("sig"))
    val a = docs.filter($"doc_id" < 30).withColumn("corpus", lit("a"))
    val b = docs.filter($"doc_id" >= 10).withColumn("corpus", lit("b"))
    val sigs = a.unionByName(b).groupBy($"corpus")
      .agg(MinHashUnion.agg($"sig").as("u"))
      .as[(String, Seq[Long])].collect().toMap
    val sim = SketchKernels.signatureSimilarity(
      sigs("a").toArray, sigs("b").toArray)
    assert(sim > 0.2 && sim < 0.95, s"union sim $sim out of plausible band")
  }
}
