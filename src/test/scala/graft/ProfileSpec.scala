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

  private def singleScan(df: org.apache.spark.sql.DataFrame,
                         what: String): Unit = {
    val scans = "Scan|LocalTableScan".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans == 1, s"$what: expected a single scan, got $scans")
  }

  test("numeric moments: exact-DECIMAL sums then the fixed double chain, bit-identical") {
    val df = Seq(
      (java.lang.Double.valueOf(1.25), "a"),
      (java.lang.Double.valueOf(2.50), "b"),
      (java.lang.Double.valueOf(2.50), "b"),
      (null: java.lang.Double, null: String)).toDF("x", "s")
    val out = Profile.describe(df, Seq("s"), numericCols = Seq("x"))
    // assert the plan BEFORE executing: a collected AQE plan prints
    // Final + Initial trees and double-counts the scan
    singleScan(out, "moments profile")
    val got = out.collect().map(r => r.getString(0) -> r).toMap
    // exact col: unchanged stats, null cast-fail + moments
    val s = got("s")
    assert((s.getLong(1), s.getLong(2), s.getLong(3), s.getString(4),
      s.getString(5)) == ((4L, 1L, 2L, "a", "b")))
    assert(s.isNullAt(6), "exact col must carry null n_cast_fail")
    assert(s.isNullAt(7) && s.isNullAt(8), "exact col must carry null moments")
    // numeric col profiles its DECIMAL(18,2) view: fixed-point
    // min/max strings, moments replaying the straight-line chain
    val x = got("x")
    assert((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4),
      x.getString(5), x.getLong(6)) == ((4L, 1L, 2L, "1.25", "2.50", 0L)))
    val (md, sxd, sxxd) = (3.0, 6.25, 14.0625)
    val wantMean = sxd / md
    val wantSd =
      math.sqrt(math.max(0.0, (md * sxxd - sxd * sxd) / (md * (md - 1.0))))
    assert(java.lang.Double.doubleToLongBits(x.getDouble(7)) ==
      java.lang.Double.doubleToLongBits(wantMean), "mean not bit-identical")
    assert(java.lang.Double.doubleToLongBits(x.getDouble(8)) ==
      java.lang.Double.doubleToLongBits(wantSd), "stddev not bit-identical")
  }

  test("dirty numerics: NaN/Inf/overflow count as n_cast_fail, excluded from moments, never crash") {
    // a profiler is the tool pointed at dirty data: an ANSI cast
    // would crash the pass on the first NaN, a silent cast would
    // fold these into n_null — both wrong
    val df = Seq(
      java.lang.Double.valueOf(2.0),
      java.lang.Double.valueOf(4.0),
      java.lang.Double.valueOf(Double.NaN),
      java.lang.Double.valueOf(Double.PositiveInfinity),
      java.lang.Double.valueOf(1e17), // > DECIMAL(18,2) capacity
      null: java.lang.Double).toDF("x")
    val got = Profile.describe(df, Nil, numericCols = Seq("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    assert(x.getLong(1) == 6L, "n")
    assert(x.getLong(2) == 1L, "n_null counts RAW nulls only")
    assert(x.getLong(6) == 3L, "NaN, Inf, 1e17 are cast failures")
    assert(x.getLong(3) == 2L && x.getString(4) == "2.00" &&
      x.getString(5) == "4.00", "stats describe the castable values")
    assert(x.getDouble(7) == 3.0, "mean over castable values only")
  }

  test("moment null contracts: no rows -> null mean; one row -> null stddev; constant -> stddev 0") {
    val df = Seq(
      (null: java.lang.Double, java.lang.Double.valueOf(7.0),
        java.lang.Double.valueOf(5.0)),
      (null: java.lang.Double, null: java.lang.Double,
        java.lang.Double.valueOf(5.0)))
      .toDF("none", "one", "const")
    val got = Profile.describe(df, Nil, Seq("none", "one", "const"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("none").isNullAt(7) && got("none").isNullAt(8))
    assert(got("one").getDouble(7) == 7.0 && got("one").isNullAt(8))
    // the clamp keeps a rounded-negative zero variance at exactly 0,
    // never an engine-spelled NaN
    assert(got("const").getDouble(7) == 5.0 && got("const").getDouble(8) == 0.0)
  }

  test("declaration guards: duplicate columns and non-numeric numericCols rejected") {
    val df = Seq((1.0, "a")).toDF("x", "s")
    intercept[IllegalArgumentException](
      Profile.describe(df, Seq("s", "s")))
    intercept[IllegalArgumentException](
      Profile.describe(df, Seq("s"), numericCols = Seq("s")))
    intercept[IllegalArgumentException](
      Profile.describeApprox(df, Seq("s", "s")))
    // a string column declared numeric would silently profile as
    // 100% null through the DECIMAL cast — rejected up front
    intercept[IllegalArgumentException](
      Profile.describe(df, Nil, numericCols = Seq("s")))
    // the guard resolves like the engine: case-insensitive under the
    // default resolver, so a casing the query accepts profiles fine
    assert(Profile.describe(df, Nil, numericCols = Seq("X"))
      .collect().length == 1)
    intercept[IllegalArgumentException](
      Profile.describe(df, Nil, numericCols = Seq("nope")))
  }

  test("describeWithQuantiles: Hdr cent quantiles in one extra scan; envelope and null contracts") {
    // cents land in the Hdr SINGLETON region (< 2^6 at b=5) for small
    // values, so estimates there are EXACT percentile_disc
    val xs = Seq(0.01, 0.02, 0.10, 0.25, 0.25, 0.40, 0.55, 0.63, 0.63, 0.63)
    val df = xs.map(x => (java.lang.Double.valueOf(x), "s"))
      .toDF("x", "tag")
    val out = Profile.describeWithQuantiles(df, Seq("tag"), Seq("x"),
      qs = Seq(0.5, 0.9))
    // plan BEFORE executing (AQE double-print trap, as the other
    // asserts): exactly TWO scans — the Expand profile and the one
    // union-tagged histogram pass for ALL numeric columns
    val scans = "Scan|LocalTableScan".r
      .findAllIn(out.queryExecution.executedPlan.toString).size
    assert(scans == 2, s"expected exactly two scans, got $scans")
    val got = out.collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    // percentile_disc over cents: rank ceil(0.5*10)=5 -> 25 cents;
    // ceil(0.9*10)=9 -> 63 cents (singleton buckets: exact)
    assert(x.getLong(9) == 25L && x.getLong(10) == 63L,
      s"got p50=${x.getLong(9)} p90=${x.getLong(10)}")
    // the moments surface is untouched by the quantile join
    assert(x.getString(4) == "0.01" && x.getString(5) == "0.63")
    // exact-typed columns carry null quantiles
    assert(got("tag").isNullAt(9) && got("tag").isNullAt(10))
    // above the singleton region the Hdr envelope holds:
    // est <= true <= est * (1 + 2^-b)
    val big = (1 to 1000).map(i =>
      java.lang.Double.valueOf(i.toDouble)).toDF("x")
    val bigRow = Profile.describeWithQuantiles(big, Nil, Seq("x"))
      .collect().head
    val (p50, p99) = (bigRow.getLong(9), bigRow.getLong(10 + 1))
    assert(p50 <= 50000 && 50000 <= p50 + (p50 >> 5) + 31,
      s"p50_c=$p50 outside the Hdr envelope of 50000")
    assert(p99 <= 99000 && 99000 <= p99 + (p99 >> 5) + 31,
      s"p99_c=$p99 outside the Hdr envelope of 99000")
  }

  test("describeApprox: estimate within 3x rsd of exact; sketch-sized shuffle, single scan") {
    val n = 5000
    val df = (0 until n).map(i => (i.toLong * 2654435761L, s"v$i"))
      .toDF("k", "s")
    val out = Profile.describeApprox(df, Seq("k", "s"), rsd = 0.05)
    assert(out.columns.toSeq == Seq("column", "n", "n_null",
      "n_distinct_approx", "min_s", "max_s"))
    singleScan(out, "approx profile")
    val got = out.collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("k", "s")) {
      val est = got(c).getLong(3).toDouble
      assert(math.abs(est / n - 1.0) < 0.15,
        s"$c: approx $est vs exact $n outside 3x rsd")
      assert(got(c).getLong(1) == n && got(c).getLong(2) == 0L)
    }
  }
}
