package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing

class BucketingSpec extends GraftSuite {
  import spark.implicits._

  private def dropTables(names: String*): Unit =
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("co-located join of same-bucketed tables runs without a shuffle") {
    dropTables("bs_facts", "bs_dim")
    val facts = spark.range(0, 2000).select(
      (col("id") % 100).as("k"), (col("id") * 3).as("qty"))
    val dim = spark.range(0, 100).select(
      col("id").as("k"), concat(lit("name_"), col("id")).as("nm"))
    Bucketing.writeBucketed(facts, "bs_facts", Seq("k"), buckets = 8,
      sortCols = Seq("k"))
    Bucketing.writeBucketed(dim, "bs_dim", Seq("k"), buckets = 8,
      sortCols = Seq("k"))

    // force the join strategy that would otherwise shuffle both sides
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "bs_facts", "bs_dim",
        Seq("k"))
      val rows = joined.count()
      assert(rows == 2000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join plan still shuffles:\n$plan")

      // the same join WITHOUT bucketing does shuffle — the assertion
      // above is meaningful, not vacuous
      val unbucketed = facts.join(dim, Seq("k"))
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"))

      // results identical to the plain join
      val a = joined.select("k", "qty", "nm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val b = unbucketed.select("k", "qty", "nm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      dropTables("bs_facts", "bs_dim")
    }
  }

  test("aggregation on the bucket key skips the exchange") {
    dropTables("bs_agg")
    val facts = spark.range(0, 2000).select(
      (col("id") % 50).as("k"), col("id").as("v"))
    Bucketing.writeBucketed(facts, "bs_agg", Seq("k"), buckets = 4)
    try {
      val agg = spark.table("bs_agg").groupBy("k")
        .agg(sum(col("v")).as("s"))
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 50 && got(0L) == (0L until 2000L by 50L).sum)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally dropTables("bs_agg")
  }
}
