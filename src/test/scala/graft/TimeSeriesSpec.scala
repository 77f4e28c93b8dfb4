package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** OHLC + gap-fill contracts: straight-line brute-force bar parity
  * (equal-timestamp ties resolved by the tie id, a null value at
  * the open position staying null — position decides, not
  * null-skipping), exact DECIMAL bar sums, the dense grid spanning
  * exactly [min, max] inclusive, forward-fill carrying the last
  * non-null close with leading buckets left null, the filled flag
  * marking manufactured buckets, and partition invariance. */
class TimeSeriesSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // one key, three buckets with a gap at 02:00; the 00:00 bucket has
  // an equal-ts tie (ids 2 vs 3 — open must take id 2's null VALUE:
  // position decides) and id 1 closing it; 01:00 is a singleton;
  // 03:00 exists for a second key only
  private val evs = Seq(
    (2L, "a", ts("2026-01-01 00:10:00"), null: java.lang.Double),
    (3L, "a", ts("2026-01-01 00:10:00"), java.lang.Double.valueOf(7.0)),
    (1L, "a", ts("2026-01-01 00:50:00"), java.lang.Double.valueOf(3.5)),
    (4L, "a", ts("2026-01-01 01:30:00"), java.lang.Double.valueOf(9.25)),
    (5L, "a", ts("2026-01-01 03:20:00"), java.lang.Double.valueOf(1.0)),
    (6L, "b", ts("2026-01-01 03:00:00"), java.lang.Double.valueOf(2.0)))

  private def df = evs.toDF("event_id", "event_type", "ts", "value")

  private def bars = TimeSeries.downsampleOhlc(df, Seq("event_type"),
    col("ts"), col("value"), col("event_id"))

  test("bars: open/close by (ts, id) position — a null value at the open stays null") {
    val got = bars.collect().map { r =>
      (r.getString(0), r.getTimestamp(1).toString) ->
        ((if (r.isNullAt(2)) null else r.getDouble(2)),
         (if (r.isNullAt(3)) null else r.getDouble(3)),
         (if (r.isNullAt(4)) null else r.getDouble(4)),
         (if (r.isNullAt(5)) null else r.getDouble(5)),
         r.getLong(6), r.getDouble(7))
    }.toMap
    // 00:00 bucket: open = id 2's NULL (earliest ts, smallest id);
    // high/low skip the null; close = id 1 at 00:50
    assert(got(("a", "2026-01-01 00:00:00.0")) ==
      ((null, 7.0, 3.5, 3.5, 3L, 10.5)))
    assert(got(("a", "2026-01-01 01:00:00.0")) ==
      ((9.25, 9.25, 9.25, 9.25, 1L, 9.25)))
    assert(got(("a", "2026-01-01 03:00:00.0")) ==
      ((1.0, 1.0, 1.0, 1.0, 1L, 1.0)))
    assert(got(("b", "2026-01-01 03:00:00.0")) ==
      ((2.0, 2.0, 2.0, 2.0, 1L, 2.0)))
    assert(got.size == 4)
  }

  test("bars are partition-invariant and input-order-invariant") {
    val base = bars.collect().map(_.toString).sorted.toSeq
    for (p <- Seq(1, 7, 32)) {
      val got = TimeSeries.downsampleOhlc(
          evs.reverse.toDF("event_id", "event_type", "ts", "value")
            .repartition(p),
          Seq("event_type"), col("ts"), col("value"), col("event_id"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == base, s"p=$p")
    }
  }

  test("gap-fill: dense inclusive span, forward-filled close, filled flags") {
    val got = TimeSeries.gapFillForward(bars, Seq("event_type"),
        "bucket", "close")
      .collect().map { r =>
        (r.getString(0), r.getTimestamp(1).toString) ->
          ((if (r.isNullAt(2)) null else r.getDouble(2)), r.getInt(3))
      }.toMap
    // key a spans 00:00..03:00 inclusive = 4 buckets; key b is a
    // single bucket; nothing outside the spans
    assert(got.size == 5)
    assert(got(("a", "2026-01-01 00:00:00.0")) == ((3.5, 0)))
    assert(got(("a", "2026-01-01 01:00:00.0")) == ((9.25, 0)))
    // the manufactured 02:00 bucket carries 01:00's close
    assert(got(("a", "2026-01-01 02:00:00.0")) == ((9.25, 1)))
    assert(got(("a", "2026-01-01 03:00:00.0")) == ((1.0, 0)))
    assert(got(("b", "2026-01-01 03:00:00.0")) == ((2.0, 0)))
  }

  test("rolling z-score: straight-line replay; full windows only; zero-variance filtered") {
    // one key, hourly closes with a planted spike at index 10 and a
    // constant run (zero variance) before index 20
    val closes = (0 until 18).map(i =>
      ("a", ts(f"2026-01-01 ${i}%02d:00:00"),
        if (i == 10) 500.0 else 10.0 + (i % 3))) ++
      (0 until 10).map(i =>
        ("b", ts(f"2026-01-02 ${i}%02d:00:00"), 42.0)) // constant key
    val series = closes.toDF("g", "bucket", "close")
    val got = TimeSeries.rollingZScore(series, Seq("g"), "bucket", "close")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((r.getDouble(3), r.getInt(4)))).toMap
    // straight-line reference with the operator's exact arithmetic
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val aOnly = closes.filter(_._1 == "a").sortBy(_._2.getTime)
    val want = aOnly.indices.flatMap { i =>
      if (i < 7) None
      else {
        val wnd = aOnly.slice(i - 7, i).map(_._3)
        val s = wnd.map(d2).sum.toDouble
        val ss = wnd.map(v => d2(v) * d2(v)).sum.toDouble
        val varNum = 7.0 * ss - s * s
        if (varNum <= 0) None
        else {
          val z = (aOnly(i)._3 - s / 7.0) / math.sqrt(varNum / (7.0 * 7.0))
          Some((("a", aOnly(i)._2.toString), (z, if (math.abs(z) > 3.0) 1 else 0)))
        }
      }
    }.toMap
    assert(got == want)
    // the spike is flagged; the constant key emits nothing at all
    assert(got(("a", "2026-01-01 10:00:00.0"))._2 == 1)
    assert(!got.keys.exists(_._1 == "b"))
    // windows FOLLOWING the spike inherit it in their lookback (no
    // self-masking: the spike itself is excluded from its own window
    // but present in the next seven)
    assert(got(("a", "2026-01-01 11:00:00.0"))._2 == 0 ||
      got(("a", "2026-01-01 11:00:00.0"))._1 < 0)
  }

  test("gap-fill: buckets before a key's first value stay null but are flagged") {
    val series = Seq(
      ("k", ts("2026-01-01 00:00:00"), null: java.lang.Double),
      ("k", ts("2026-01-01 02:00:00"), java.lang.Double.valueOf(5.0)))
      .toDF("g", "bucket", "close")
    val got = TimeSeries.gapFillForward(series, Seq("g"), "bucket", "close")
      .orderBy("bucket")
      .collect().map(r => (r.getTimestamp(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("2026-01-01 00:00:00.0", null, 1), // present row, null value
      ("2026-01-01 01:00:00.0", null, 1), // manufactured, nothing to carry
      ("2026-01-01 02:00:00.0", 5.0, 0)))
  }
}
