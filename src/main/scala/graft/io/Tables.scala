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

  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")

  /** `events.ts` has shipped in two physical encodings across
    * testdata generations: parquet TIMESTAMP(NANOS) (read as raw
    * nanos via the legacy conf, then converted losslessly — integral
    * `div`, because epoch-nanos exceed 2^53 and a double division
    * would round the low microsecond digit) and, currently, a plain
    * microsecond timestamp that needs no conversion. Dispatch on the
    * READ schema, not the generation: every downstream operator sees
    * one logical shape `(ts: timestamp)` either way.
    *
    * For the nanos encoding the legacy conf must be set at session
    * construction (all graft mains and the test harness do) — it
    * cannot be a per-read option, and setting it here as a side
    * effect would mutate session-global state out from under
    * concurrent readers. Fail fast with the fix instead. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(
          spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .contains("true"),
          "events.parquet carries TIMESTAMP(NANOS): build the " +
            "SparkSession with spark.sql.legacy.parquet.nanosAsLong=true")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // all graft sessions run UTC, so NTZ → TIMESTAMP is a pure
        // type re-tag (identical micros), and downstream time
        // functions (unix_micros, watermarks) keep working unchanged
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
