package graft

import org.apache.spark.sql.functions._

import graft.etl.Snapshot
import graft.io.Tables
import graft.operators.CensusPipeline

class EtlCoreSpec extends GraftSuite {

  lazy val t = Tables(spark, sfDir)

  test("censusCount returns per-location counts on the latest day") {
    val out = CensusPipeline.censusCount(t).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
    // exactly one day contributes: counts equal orders on that day
    val locations = out.map(_.getString(0))
    assert(locations.distinct.length == locations.length)
  }

  test("hourlyCensus buckets every event exactly once") {
    val out = CensusPipeline.hourlyCensus(t)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == t.events.count())
  }

  test("Snapshot.latest keeps only max-version rows") {
    val li = t.lineitem.select("l_orderkey", "l_shipdate")
    val out = Snapshot.latest(li, to_date(col("l_shipdate")))
    val maxDay = li.agg(max(to_date(col("l_shipdate")))).collect()(0).getDate(0)
    assert(out.count() > 0)
    assert(out.select(to_date(col("l_shipdate"))).distinct().collect()
      .forall(_.getDate(0) == maxDay))
  }

  test("Snapshot.asOf respects the version ceiling") {
    val li = t.lineitem.withColumn("v", year(col("l_shipdate")).cast("long"))
    val out = Snapshot.asOf(li, col("v"), 1997L)
    assert(out.select("v").distinct().collect().map(_.getLong(0)).toSeq == Seq(1997L))
  }

  test("Snapshot.newerThan yields only rows past the watermark") {
    val out = Snapshot.newerThan(
      t.lineitem.select("l_orderkey", "l_shipdate"), col("l_shipdate"),
      t.orders, col("o_orderdate"))
    val wm = t.orders.agg(max("o_orderdate")).collect()(0)
      .getAs[java.time.LocalDateTime](0)
    assert(out.collect().forall(
      _.getAs[java.time.LocalDateTime]("l_shipdate").isAfter(wm)))
  }

  test("Snapshot.unprocessed is a set-minus on the key") {
    val incoming = t.customer.select("c_custkey")
    val processed = t.orders.select(col("o_custkey").as("c_custkey"))
    val out = Snapshot.unprocessed(incoming, processed, "c_custkey")
    // every customer has orders in this data -> empty
    assert(out.count() == 0)
    val none = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      incoming.schema)
    assert(Snapshot.unprocessed(incoming, none, "c_custkey").count() ==
      incoming.count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching column names with its oracle alias contract") {
    // each queries entry must run and return >0 rows at sf0.001
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
