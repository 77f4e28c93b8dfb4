package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Profiling contracts: typed-BEFORE-cast min/max (a string min
  * would order "10" < "9"), null counting, distinct counting, the
  * shared row count, and the single-aggregate plan shape (one
  * Expand, no per-column scan multiplication). */
class ProfileSpec extends GraftSuite {
  import spark.implicits._

  test("typed min/max, nulls, distincts — and one scan for all columns") {
    val df = Seq(
      (Some(9L), "b"), (Some(10L), "a"), (None, "a"), (Some(2L), null))
      .toDF("k", "s")
    val got = Profile.describe(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    // numeric min is 2 and max is 10 — a string min/max would say
    // "10"/"9"; the cast must happen AFTER aggregating
    assert(got("k") == (("k", 4L, 1L, 3L, "2", "10")))
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b")))
    val scans = "Scan|LocalTableScan".r
      .findAllIn(Profile.describe(df, Seq("k", "s"))
        .queryExecution.executedPlan.toString).size
    assert(scans == 1, s"expected a single scan, got $scans")
  }
}
