package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed top-K per group.
  *
  * A single `Window.partitionBy(group)` collapses parallelism to
  * |groups| reducer tasks — with a handful of groups the whole fact
  * table sorts through a handful of tasks (the reference's ranking in
  * code/ukg_open_census.py:28-29 inherits the same hazard). Phase 1
  * ranks within (group, input-partition) — thousands of buckets, fully
  * parallel — and keeps at most K rows per bucket; phase 2 ranks the
  * surviving ≤ K·numPartitions rows per group, which is dimension-sized
  * at any scale.
  *
  * Ordering must carry a deterministic tie-break (e.g. `id ASC` last)
  * for a stable result.
  */
object TopK {

  def perGroup(df: DataFrame, groups: Seq[Column], order: Seq[Column],
               k: Int, rankCol: String = "rnk"): DataFrame = {
    val narrowed = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy((groups :+ col("__pid")): _*).orderBy(order: _*)))
      .where(col("__lrn") <= k)
      .drop("__pid", "__lrn")
    val global = Window.partitionBy(groups: _*).orderBy(order: _*)
    narrowed
      .withColumn(rankCol, row_number().over(global).cast("long"))
      .where(col(rankCol) <= k)
  }
}
