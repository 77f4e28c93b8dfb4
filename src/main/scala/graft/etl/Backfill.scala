package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Backfill / date-range parameterized loads
  * (code/ukg_wrkload_dtl.py:93-107 and README "backfills").
  *
  * The reference resolves (back_fill_days | date_range) to a
  * start/end pair for its API pull; on a lake table the same contract
  * is a partition-prunable timestamp filter.
  */
object Backfill {

  /** Inclusive start, exclusive end — [start, end) in UTC. */
  def range(df: DataFrame, ts: Column, startIso: String,
            endIso: String): DataFrame =
    df.where(ts >= to_timestamp(lit(startIso)) &&
      ts < to_timestamp(lit(endIso)))

  /** Trailing window ending at the data's own max timestamp. */
  def trailingDays(df: DataFrame, ts: Column, days: Int): DataFrame =
    Compaction.retain(df, ts, days)
}
