package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Exact-moment regression contracts: bit-identical parity with a
  * straight-line BigDecimal-sums + IEEE-double-closed-forms replay,
  * a hand-checkable perfect-fit line, null exclusion, zero-variance
  * groups filtered (no engine-dependent Inf/NaN spellings), group
  * isolation, and partition invariance (the DECIMAL sums are
  * order-free, so the doubles cannot move). */
class StatsSpec extends GraftSuite {
  import spark.implicits._

  /** The operator's exact arithmetic, straight-line. */
  private def refFit(rows: Seq[(Double, Double)])
      : Option[(Long, Double, Double, Double)] = {
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val n = rows.size.toLong
    val sx = rows.map(r => d2(r._1)).sum
    val sy = rows.map(r => d2(r._2)).sum
    val sxy = rows.map(r => d2(r._1) * d2(r._2)).sum
    val sxx = rows.map(r => d2(r._1) * d2(r._1)).sum
    val syy = rows.map(r => d2(r._2) * d2(r._2)).sum
    val nd = n.toDouble
    val denX = nd * sxx.toDouble - sx.toDouble * sx.toDouble
    val denY = nd * syy.toDouble - sy.toDouble * sy.toDouble
    val num = nd * sxy.toDouble - sx.toDouble * sy.toDouble
    if (denX == 0.0 || denY == 0.0) None
    else Some((n, num / denX,
      (sy.toDouble - (num / denX) * sx.toDouble) / nd,
      num / math.sqrt(denX * denY)))
  }

  private def run(rows: Seq[(String, java.lang.Double, java.lang.Double)],
                  parts: Int = 4) =
    Stats.linearFit(
        rows.toDF("g", "x", "y").repartition(parts),
        col("x"), col("y"), groupCols = Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("perfect line: y = 2x + 1 gives slope 2, intercept 1, r = 1") {
    val rows = (1 to 50).map(i =>
      ("a", java.lang.Double.valueOf(i), java.lang.Double.valueOf(2.0 * i + 1)))
    val got = run(rows)("a")
    assert(got._1 == 50L)
    assert(math.abs(got._2 - 2.0) < 1e-12)
    assert(math.abs(got._3 - 1.0) < 1e-12)
    assert(math.abs(got._4 - 1.0) < 1e-12)
  }

  test("bit-identical parity with the straight-line replay; nulls excluded; group isolation") {
    val rnd = new scala.util.Random(3)
    def money() = math.round(rnd.nextDouble() * 10000) / 100.0
    val rows = (0 until 400).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, java.lang.Double.valueOf(money()), java.lang.Double.valueOf(money()))
    } ++ Seq(
      ("a", null: java.lang.Double, java.lang.Double.valueOf(5.0)),
      ("b", java.lang.Double.valueOf(5.0), null: java.lang.Double))
    val got = run(rows)
    for (g <- Seq("a", "b")) {
      val clean = rows.filter(r => r._1 == g && r._2 != null && r._3 != null)
        .map(r => (r._2.doubleValue, r._3.doubleValue))
      val Some((n, sl, ic, r)) = refFit(clean)
      val (gn, gsl, gic, gr) = got(g)
      // EXACT equality: decimal sums are order-free and the double
      // tree is fixed, so not even the last ulp may differ
      assert(gn == n && gsl == sl && gic == ic && gr == r, s"g=$g")
    }
  }

  test("zero-variance groups are filtered, not emitted as Inf/NaN") {
    val rows = Seq(
      ("const-x", 3.0, 1.0), ("const-x", 3.0, 2.0), ("const-x", 3.0, 9.0),
      ("const-y", 1.0, 4.0), ("const-y", 2.0, 4.0), ("const-y", 8.0, 4.0),
      ("ok", 1.0, 1.0), ("ok", 2.0, 3.0), ("ok", 3.0, 4.0))
      .map { case (g, x, y) =>
        (g, java.lang.Double.valueOf(x), java.lang.Double.valueOf(y)) }
    val got = run(rows)
    assert(got.keySet == Set("ok"))
  }

  test("star-revenue join ladder: forced SMJ (no broadcast, no AQE) returns identical results") {
    // pins the SURVEY claim that the multi-join query is hint-free
    // except nation: with broadcasts disabled the planner must fall
    // back to sort-merge joins and the DECIMAL revenue must not move
    val q = SparkEntry.queries("q_star_revenue")
    def rows() = q(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    val default = rows()
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = q(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // nation rides an explicit broadcast() hint; the two fact-side
      // joins must have degraded to sort-merge
      assert("SortMergeJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
      val forced = df.collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getLong(3)))).toMap
      assert(forced == default)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("partition invariance: identical doubles at any parallelism") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 500).map { i =>
      ("g", java.lang.Double.valueOf((i % 37) + 0.25),
        java.lang.Double.valueOf(math.round(rnd.nextDouble() * 1e5) / 100.0))
    }
    val base = run(rows, parts = 1)("g")
    for (p <- Seq(7, 32)) {
      assert(run(rows, parts = p)("g") == base, s"p=$p")
    }
  }
}
