package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Shuffle-free batch key for fact-scale inputs: stable hash bucket
    * (batches are balanced, not contiguous). */
  def batchedByHash(df: DataFrame, keys: Seq[Column], numBatches: Int,
                    out: String = "batch_id"): DataFrame =
    df.withColumn(out, pmod(hash(keys: _*), lit(numBatches)).cast("long"))
}
