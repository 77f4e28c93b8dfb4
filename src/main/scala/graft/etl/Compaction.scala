package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPTIMIZE / VACUUM / retention-delete analog
  * (code/ukg_tbl_optmztn.py).
  *
  * Without Delta, "OPTIMIZE" is a size-targeted rewrite and the
  * retention delete is an anti-filter rewrite. Both are expressed so
  * the scan prunes: the retention cutoff is a 1-row aggregate joined
  * broadcast (or a literal when the caller knows it), never a
  * driver-side collect.
  */
object Compaction {

  /** Rows younger than `days` before the max of `ts` (inverse of the
    * reference's retention delete). */
  def retain(df: DataFrame, ts: Column, days: Int): DataFrame = {
    val cut = df.agg(
      (max(ts) - expr(s"INTERVAL $days DAYS")).as("__cut"))
    df.join(broadcast(cut), ts >= col("__cut")).drop("__cut")
  }

  /** OPTIMIZE analog: rewrite `df` to `path` targeting
    * `targetFileMB`-sized parquet files (estimate via input size). */
  def compactTo(df: DataFrame, path: String, targetFileMB: Int = 512,
                approxInputBytes: Long): Unit = {
    val files = math.max(1L, approxInputBytes / (targetFileMB * 1024L * 1024L))
    df.repartition(files.toInt).write.mode("overwrite").parquet(path)
  }
}
