package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Access bridge for `SparkSession.cloneSession()` (`private[sql]`).
  *
  * A clone shares the SparkContext and SharedState (cache manager,
  * listing caches) but COPIES the session state — conf, temp views,
  * registered functions — so a conf flip on the clone is invisible to
  * the original session. This is the isolation the q182/q183 DFP
  * gates need: their gating execution must run with
  * `dynamicPartitionPruning.useStats=false` (toy-scale estimates
  * decline the filter otherwise), and flipping that on the SHARED
  * session opens a window in which any concurrent query in the same
  * session plans under the wrong heuristic (r17 advice #4).
  * `newSession()` would isolate conf too, but drops temp views and
  * starts a fresh conf from the context defaults instead of the
  * session's current values; the clone preserves both.
  */
object SessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
