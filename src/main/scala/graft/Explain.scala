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
    // first arg is the output path unless it names a query
    val (out, rest) =
      if (args.headOption.exists(_.startsWith("q_")))
        ("/tmp/explain.txt", args.toSeq)
      else (args.headOption.getOrElse("/tmp/explain.txt"), args.drop(1).toSeq)
    val names = if (rest.nonEmpty) rest
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
      // warm (JIT/codegen) then measure; noop write so projection
      // expressions actually execute (count() would prune them)
      def run(): Long = {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        df.count()
      }
      run()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = fn(spark, sfDir).count()
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
