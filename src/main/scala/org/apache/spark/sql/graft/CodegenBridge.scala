package org.apache.spark.sql.graft

import org.apache.spark.metrics.source.CodegenMetrics

/** Bridge to the `private[spark]` whole-stage-codegen metrics — the
  * per-query compilation witness. `CodeGenerator`'s generated-class
  * cache is a bounded Guava cache (100 entries); a long suite churns
  * it, and an evicted plan's next execution RECOMPILES through
  * Janino — wall-clock that looks like "the query got slower" with
  * no source change. The cumulative compilation COUNT (exact — the
  * Codahale histogram's count, not its sampled reservoir) taken
  * before/after a query splits that attribution: fresh-JVM delta ==
  * in-suite delta means no recompilation story; in-suite delta
  * higher means cache eviction, named. Same access-package pattern
  * as [[ListenerBridge]]. */
object CodegenBridge {
  /** Cumulative number of Janino compilations in this JVM. */
  def compileCount: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  /** Mean compile time (ms) over the histogram's reservoir — an
    * approximation (sampled), only for sizing a count delta. */
  def meanCompileMs: Double =
    CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean
}
