package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    val orders = Tables.orders(spark, sf0001)
      .select($"o_custkey".as("custkey"), $"o_totalprice")
    val customers = Tables.customer(spark, sf0001)
      .select($"c_custkey".as("custkey"), $"c_mktsegment")

    Bucketing.writeBucketed(orders, "orders_b", "custkey", 4)
    Bucketing.writeBucketed(customers, "customers_b", "custkey", 4)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customers_b", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // correctness unchanged vs plain join
      val want = orders.join(customers, "custkey").count()
      assert(joined.count() == want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customers_b")
    }
  }
}
