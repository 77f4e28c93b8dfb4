package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Frees the blocks behind a `localCheckpoint(eager = true)`'d frame.
  *
  * `Dataset.unpersist()` routes through the CacheManager, which only
  * knows about frames registered via `.persist()` — a checkpointed
  * Dataset's blocks live on the RDD itself (its plan is a
  * [[LogicalRDD]]), so `unpersist()` is a silent no-op and the blocks
  * survive until the driver GCs the RDD and the ContextCleaner runs.
  * Iterative operators (connected components, Lloyd refinement) must
  * release each round's blocks deterministically or rounds × frame
  * size of storage accumulates; this reaches through the plan to the
  * checkpointed RDD. Same access-package pattern as [[ColumnBridge]].
  */
object CheckpointBridge {
  def unpersist(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking)
      case _ =>
    }

  /** Harness-side sweep: frees EVERY persisted RDD still registered with
    * the SparkContext. `cacheManager.clearCache()` only drops frames that
    * went through `.persist()`; a query that returns a
    * `localCheckpoint`ed frame (connected components, IVF centroids)
    * leaves its blocks live until driver GC — across a 42-query bench
    * run those blocks accumulate in the heap and the resulting memory
    * pressure lands on whichever query runs later. Call this after
    * `clearCache()` between queries; at that point any surviving entry
    * in `getPersistentRDDs` is an orphaned checkpoint block by
    * construction. Returns how many RDDs were swept (observability for
    * the harness log).
    */
  def unpersistAll(spark: org.apache.spark.sql.SparkSession,
                   blocking: Boolean = false): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.valuesIterator.foreach(_.unpersist(blocking))
    rdds.size
  }
}
