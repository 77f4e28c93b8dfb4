package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.etl.Snapshot
import graft.operators.CensusPipeline

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CensusPipeline.censusCount(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_census_count" -> ((s, dir) =>
      CensusPipeline.censusCount(Tables(s, dir))),

    "q_hourly_census" -> ((s, dir) =>
      CensusPipeline.hourlyCensus(Tables(s, dir))),

    "q_latest_run_snapshot" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      Snapshot.latest(li, to_date(col("l_shipdate")))
    }),

    "q_scd_watermark" -> ((s, dir) => {
      val t = Tables(s, dir)
      Snapshot.newerThan(
        t.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate"),
        col("l_shipdate"), t.orders, col("o_orderdate"))
    }),

    "q_unprocessed_anti_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cut = t.orders.agg(
        (max(col("o_orderdate")) - expr("INTERVAL 365 DAYS")).as("cut"))
      val recent = t.orders.select("o_custkey", "o_orderdate")
        .join(broadcast(cut), col("o_orderdate") > col("cut"))
      Snapshot.unprocessed(
        t.customer.select(col("c_custkey"), col("c_name")),
        recent.select(col("o_custkey").as("c_custkey")), "c_custkey")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_census_count" ->
      """WITH dep AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_mktsegment IS NOT NULL AND c_acctbal > 0
        |), ptnt AS (
        |  SELECT o.o_orderkey, dep.c_mktsegment, CAST(o.o_orderdate AS DATE) AS o_day
        |  FROM orders o JOIN dep ON o.o_custkey = dep.c_custkey
        |  WHERE o.o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
        |)
        |SELECT c_mktsegment AS location, count(o_orderkey) AS census_cnt
        |FROM ptnt WHERE o_day = (SELECT max(o_day) FROM ptnt)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_hourly_census" ->
      """SELECT event_type, date_trunc('hour', ts) AS hr,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_latest_run_snapshot" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) =
        |      (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem)""".stripMargin,

    "q_scd_watermark" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate > (SELECT max(o_orderdate) FROM orders)""".stripMargin,

    "q_unprocessed_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate > (SELECT max(o_orderdate) - INTERVAL 365 DAY FROM orders))""".stripMargin
  )
}
