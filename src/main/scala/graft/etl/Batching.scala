package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-size batch assignment.
  *
  * The reference collects qualifiers to the driver and np.array_splits
  * them (`generate_batchs`, code/ukg_open_census.py:549-554) for
  * batched API posting. Distributed equivalent: number rows with a
  * window and bucket by integer division.
  *
  * Scale note: the global `row_number` funnels through one partition;
  * that is fine here because batching applies to *dimension-sized*
  * inputs (qualifier lists). For fact-sized inputs use
  * `batchedByHash`, which needs no global order.
  */
object Batching {

  /** Deterministic contiguous batches of `size` in `order` order. */
  def assign(df: DataFrame, order: Column, size: Int,
             out: String = "batch_id"): DataFrame =
    df.withColumn(out,
      ((row_number().over(Window.orderBy(order)) - 1) / size)
        .cast("long"))

  /** Contiguous batches at fact scale: partition-offset numbering.
    *
    * `assign`'s global-order window funnels every row through one task.
    * Here the global row number is assembled from parallel pieces:
    *   1. range-repartition + local sort on `order` (global order
    *      across partitions, unique key assumed);
    *   2. `monotonically_increasing_id` yields the *local* row index
    *      (low 33 bits) and partition id (high bits) with no shuffle;
    *   3. per-partition row counts (a numPartitions-row aggregate)
    *      cumulative-sum into start offsets, broadcast back;
    *   4. global row number = offset(pid) + local index — pure map.
    * The only data-sized movement is the range shuffle itself.
    */
  def assignScalable(df: DataFrame, order: Column, size: Int,
                     partitions: Int, out: String = "batch_id"): DataFrame = {
    val ranged = df.repartitionByRange(partitions, order)
      .sortWithinPartitions(order)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__idx", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // numPartitions rows: the single-task window here is over ≤
    // `partitions` rows, not the data.
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid").as("__opid"), col("__off"))
    ranged
      .join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn(out, ((col("__off") + col("__idx")) / size).cast("long"))
      .drop("__mid", "__pid", "__idx", "__opid", "__off")
  }

  /** Shuffle-free batch key for fact-scale inputs: stable hash bucket
    * (batches are balanced, not contiguous). */
  def batchedByHash(df: DataFrame, keys: Seq[Column], numBatches: Int,
                    out: String = "batch_id"): DataFrame =
    df.withColumn(out, pmod(hash(keys: _*), lit(numBatches)).cast("long"))
}
