package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory.
  *
  * The reference reads Delta tables by name (`spark.read.format("delta")
  * .table("ukg.ukg_dept_bus_strctr")`, ukg_wrkload_dtl.py:29); here the
  * catalog is path-based parquet. Readers are plain `spark.read.parquet`
  * so Catalyst keeps full pushdown/pruning into the scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default. Read it as raw nanos (legacy conf) and
    * convert losslessly to a microsecond timestamp (the data carries
    * no sub-microsecond parts).
    *
    * The conf must be set at session construction (all graft mains and
    * the test harness do) — it cannot be a per-read option, and
    * setting it here as a side effect would mutate session-global
    * state out from under concurrent readers. Fail fast with the fix
    * instead.
    */
  private def eventsRaw: DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the SparkSession " +
        "with spark.sql.legacy.parquet.nanosAsLong=true")
    t("events")
  }

  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    // integral `div`: epoch-nanos exceed 2^53, double division would
    // round the low microsecond digit.
    eventsRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
