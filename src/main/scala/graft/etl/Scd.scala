package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 interval builder: fold a change-event stream into
  * validity intervals `(key..., attrs..., valid_from, valid_to,
  * is_current)` — each kept row opens when its change arrives and
  * closes when the NEXT change of the same key arrives (exclusive;
  * null/`is_current` = 1 on the open interval).
  *
  * The reference keeps SCD state implicitly (the watermark pattern
  * around SCHDL_RN / max-run snapshots, ukg_wrkload_dtl.py); this
  * makes the type-2 dimension itself a first-class build: the form a
  * warehouse joins facts against AS OF a time ([[graft.operators.AsofJoin]]
  * consumes exactly this shape).
  *
  * Change compression: consecutive rows (in `(ts, tie)` order) whose
  * tracked attributes are all unchanged (null-safe compare) collapse
  * into the earlier interval — a re-delivered state that sorts
  * adjacent to its original compresses away (idempotent ingest,
  * spec-pinned; a duplicate whose tie id sorts PAST a different
  * same-timestamp state legitimately re-opens — order is the
  * contract, as in any type-2 build). The first row of a key always
  * opens an interval, even with all-null attributes (detected by the
  * tie column's lag, not the attributes').
  *
  * Scale shape: ONE exchange on the key; both windows (the
  * change-detection `lag`, the interval-closing `lead`) and the
  * filter between them share that partitioning — the filter only
  * shrinks partitions, so no second shuffle. Ties at the same
  * timestamp order by the caller's unique `tie` column:
  * deterministic intervals under any physical row order.
  */
object Scd {

  def buildType2(changes: DataFrame, keys: Seq[String], ts: Column,
                 tie: Column, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "SCD2 needs at least one tracked attribute")
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(ts.asc, tie.asc)
    val withPrev = changes
      .withColumn("__ts", ts).withColumn("__tie", tie)
      // row_number, not lag(tie).isNull: a NULL tie value would make
      // the row AFTER it look "first" and unconditionally open an
      // interval even with unchanged attributes — row_number detects
      // the true first row independent of tie nullability
      .withColumn("__first", row_number().over(ord) === 1)
      .withColumn("__changed",
        attrs.map(a => !(col(a) <=> lag(col(a), 1).over(ord)))
          .reduce(_ || _))
    val kept = withPrev.where(col("__first") || col("__changed"))
    val ord2 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tie").asc)
    kept.select(
      (keys ++ attrs).map(col) ++ Seq(
        col("__ts").as("valid_from"),
        lead(col("__ts"), 1).over(ord2).as("valid_to"),
        when(lead(col("__ts"), 1).over(ord2).isNull, 1).otherwise(0)
          .as("is_current")): _*)
  }
}
