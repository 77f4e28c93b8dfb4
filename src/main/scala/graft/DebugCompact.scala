package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/tmp/debug_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("DROP TABLE IF EXISTS dbg_store")
    spark.sql("DROP TABLE IF EXISTS dbg_tmp")
    val df = spark.range(0, 1000).select((col("id") % 50).as("k"), col("id").as("v"))
    graft.io.Bucketing.writeBucketed(df, "dbg_store", Seq("k"), buckets = 4)
    (1 to 3).foreach { i =>
      graft.io.Bucketing.appendBucketed(
        spark.range(1000 * i, 1000 * i + 200)
          .select((col("id") % 50).as("k"), col("id").as("v")),
        "dbg_store", Seq("k"), buckets = 4)
    }
    println("fpb store = " + graft.io.Bucketing.filesPerBucket(spark, "dbg_store"))
    val src = spark.table("dbg_store")
    src.repartition(4, col("k")).write.format("noop").mode("overwrite").save()
    println("rewrite source plan:")
    println(src.repartition(4, col("k")).queryExecution.executedPlan.toString)
    graft.io.Bucketing.writeBucketed(src, "dbg_tmp", Seq("k"), buckets = 4)
    println("fpb tmp = " + graft.io.Bucketing.filesPerBucket(spark, "dbg_tmp"))
    import scala.jdk.CollectionConverters._
    val loc = new java.io.File(new java.net.URI(graft.io.Bucketing.tableLocation(spark, "dbg_tmp")))
    loc.listFiles().filter(!_.getName.startsWith("_")).foreach(f => println("  tmpfile " + f.getName))
    spark.stop()
  }
}
