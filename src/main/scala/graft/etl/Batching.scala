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

  /** Weighted contiguous packing at fact scale — the training-data
    * "concat-and-chunk" step: docs in `order` order are chunked into
    * packs of ≈ `budget` total `weight` (token count), pack = the
    * budget-bucket of the cumulative weight *before* the row. A doc
    * straddling a boundary belongs to the pack its first token falls
    * in — contiguous, deterministic, and exact in integer arithmetic.
    *
    * Same partition-offset shape as `assignScalable`, with weighted
    * sums instead of counts: range shuffle + local cumsum window per
    * partition, a ≤`partitions`-row offset window, and a broadcast
    * join back — no global-order funnel, no data-sized window.
    */
  def packByWeight(df: DataFrame, order: Column, weight: Column,
                   budget: Long, partitions: Int,
                   out: String = "pack_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val ranged = df.repartitionByRange(partitions, order)
      .sortWithinPartitions(order)
      .withColumn("__w", coalesce(weight.cast("long"), lit(0L)))
      .withColumn("__pid",
        shiftright(monotonically_increasing_id(), 33))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // within-partition cumulative weight INCLUDING the current row
    val local = ranged.withColumn("__cum",
      sum(col("__w")).over(
        Window.partitionBy(col("__pid")).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-partition totals → start offsets (≤ `partitions` rows)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col("__w")).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid").as("__opid"), col("__off"))
    local.join(broadcast(offsets), col("__pid") === col("__opid"))
      // cumulative weight BEFORE this row, integral-divided (exact)
      .withColumn(out,
        expr(s"(__off + __cum - __w) div $budget"))
      .drop("__w", "__pid", "__cum", "__opid", "__off")
  }
}
