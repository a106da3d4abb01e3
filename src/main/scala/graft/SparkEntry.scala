package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with a DuckDB-equivalent oracle in [[oracleSql]]. Column names are
  * aliased identically on both sides (the driver's compare sorts columns
  * by name before hashing).
  */
object SparkEntry {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.table(s, d, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A4/A1: classic partial+final hash aggregation (TPC-H Q1 shape).
    "q01_pricing_summary" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_base_price"),
          sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          avg($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // P1: IN-list predicate + aggregation.
    "q02_segment_filter" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum($"c_acctbal").as("total_bal"))
        .orderBy($"c_mktsegment")
    }),

    // P2/P3: CASE-WHEN classification chain (link-classification shape).
    "q03_case_classify" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .withColumn("class",
          when($"p_type" === "PROMO", "promo")
            .when($"p_type".isin("SMALL", "MEDIUM"), "compact")
            .when($"p_size" >= 40, "oversize")
            .otherwise("standard"))
        .groupBy($"class")
        .agg(count(lit(1)).as("n"), avg($"p_retailprice").as("avg_price"))
        .orderBy($"class")
    }),

    // J1: broadcast hash equi-join, small dim side.
    "q04_join_broadcast" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum($"o_totalprice").as("revenue"))
        .orderBy($"c_nationkey")
    }),

    // J-chain: 3-way broadcast join through the dimension hierarchy.
    "q05_join_multi" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_cust"), sum($"c_acctbal").as("total_bal"))
        .orderBy($"r_name")
    }),

    // A2/W2: struct-ordering argmax (latest-quarter selection shape).
    "q06_argmax_latest" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(
          max($"o_orderdate").as("latest_date"),
          max_by($"o_orderkey", struct($"o_orderdate", $"o_orderkey"))
            .as("latest_orderkey"))
        .orderBy($"o_custkey")
    }),

    // W1: per-group top-k via rank window (promising-links shape).
    "q07_topk_per_group" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
        .orderBy($"o_custkey", $"rk")
    }),

    // D1: dedup as distinct-count per group.
    "q08_dedup_count" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
             countDistinct($"l_suppkey").as("n_supps"))
        .orderBy($"l_returnflag")
    }),

    // D2: left-anti join (visited-URL skip shape).
    "q09_anti_join" -> ((s, d) => {
      import s.implicits._
      val pending = t(s, d, "orders")
        .filter($"o_orderstatus" === "P").select($"o_custkey")
      t(s, d, "customer")
        .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_no_orders"))
        .orderBy($"c_mktsegment")
    }),

    // D3: union across sources then global distinct.
    "q10_union_distinct" -> ((s, d) => {
      import s.implicits._
      val a = t(s, d, "lineitem").select($"l_partkey".as("pk"))
      val b = t(s, d, "part").select($"p_partkey".as("pk"))
      a.unionByName(b).distinct()
        .agg(count(lit(1)).as("n_distinct_parts"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_segment_filter" ->
      """SELECT c_mktsegment, count(*) AS n_cust, sum(c_acctbal) AS total_bal
         FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q03_case_classify" ->
      """SELECT CASE WHEN p_type = 'PROMO' THEN 'promo'
                     WHEN p_type IN ('SMALL','MEDIUM') THEN 'compact'
                     WHEN p_size >= 40 THEN 'oversize'
                     ELSE 'standard' END AS class,
                count(*) AS n, avg(p_retailprice) AS avg_price
         FROM part GROUP BY 1 ORDER BY class""",
    "q04_join_broadcast" ->
      """SELECT c_nationkey, count(*) AS n_orders, sum(o_totalprice) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q05_join_multi" ->
      """SELECT r_name, count(*) AS n_cust, sum(c_acctbal) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q06_argmax_latest" ->
      """SELECT o_custkey, o_orderdate AS latest_date, o_orderkey AS latest_orderkey
         FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q07_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q08_dedup_count" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q09_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_no_orders
         FROM customer WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q10_union_distinct" ->
      """SELECT count(*) AS n_distinct_parts FROM (
           SELECT DISTINCT pk FROM (
             SELECT l_partkey AS pk FROM lineitem
             UNION ALL SELECT p_partkey AS pk FROM part))"""
  )
}
