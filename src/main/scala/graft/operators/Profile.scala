package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass data profiling: per-column `(column, n, n_null,
  * n_distinct, min_s, max_s)` — the DESCRIBE/df.describe analog as
  * an oracle-checkable DataFrame.
  *
  * Scale shape: ONE aggregate over the table computes every
  * column's statistics side by side (the multi-distinct plans as a
  * single Expand + aggregate — one shuffle regardless of how many
  * columns are profiled), then the single result row explodes into
  * per-column rows. k columns never cost k scans.
  *
  * Typed min/max are cast to string AFTER aggregating (a string min
  * of "10" < "9" would be wrong for numerics). Exact-typed columns
  * only (integers, strings, dates) by the caller's contract:
  * double→string rendering is not engine-portable at the scientific
  * notation boundary — doubles get `Stats`/`Hdr`, not this. */
object Profile {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(cols.map { c =>
        struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
          col(s"__dist_$c").as("n_distinct"),
          col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
      }: _*)).as("__p"))
      .select(col("__p.column").as("column"), col("__n").as("n"),
        col("__p.n_null").as("n_null"),
        col("__p.n_distinct").as("n_distinct"),
        col("__p.min_s").as("min_s"), col("__p.max_s").as("max_s"))
  }
}
