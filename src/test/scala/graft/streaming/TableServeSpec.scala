package graft.streaming

import graft.SparkTestBase
import graft.io.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TableServeSpec extends SparkTestBase {
  import spark.implicits._

  test("enrich serves the CURRENT snapshot per micro-batch: a publish " +
      "mid-stream is picked up on the next batch, no restart") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_tserve_root"
    VersionedTable.drop(spark, root)
    VersionedTable.publish(
      Seq((1L, "one-v1"), (2L, "two-v1")).toDF("k", "label"), root)
    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("k")
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int)]
    val q = TableServe.enrich(spark, root, stream, Seq("k")) {
      (batch: DataFrame, _: Long) =>
        got ++= batch.select($"k", $"label", $"enrich_version")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    }.start()
    try {
      mem.addData(1L)
      q.processAllAvailable()
      assert(got.toSeq == Seq((1L, "one-v1", 1)))
      // publish v2 while the stream is live
      VersionedTable.publish(
        Seq((1L, "one-v2"), (2L, "two-v2")).toDF("k", "label"), root)
      mem.addData(1L, 2L)
      q.processAllAvailable()
      assert(got.toSet == Set((1L, "one-v1", 1),
        (1L, "one-v2", 2), (2L, "two-v2", 2)), got.toSeq.toString)
    } finally q.stop()
  }

  test("enrich on an unpublished root fails the batch with a clear " +
      "message") {
    implicit val sqlCtx = spark.sqlContext
    val root = "/tmp/graft_tserve_empty"
    VersionedTable.drop(spark, root)
    val mem = MemoryStream[Long]
    val q = TableServe.enrich(spark, root, mem.toDF().toDF("k"),
      Seq("k")) { (_, _) => () }.start()
    try {
      mem.addData(1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("no published version") ||
        Option(e.getCause).exists(_.getMessage != null) &&
          e.getCause.getMessage.contains("no published version"))
    } finally q.stop()
  }
}
