package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan/pushdown audit tool: for each query (args, or all), print the
  * isolated wall time and the formatted physical plan. Source for
  * PERF.md; also how plan regressions get caught between rounds.
  *
  * Usage: runMain graft.Explain [out.txt] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/explain.txt")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm (JIT/codegen) then measure
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      sb.append(f"==== $name%s rows=$n%d warm_sec=$sec%.3f ====%n")
      sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
      spark.sharedState.cacheManager.clearCache()
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
