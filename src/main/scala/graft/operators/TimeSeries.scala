package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series downsampling (OHLC bars) and gap-fill
  * (forward-fill over a dense time grid) — the two standard
  * shape-changing operations a time-keyed fact stream needs before
  * charting, feature extraction, or as-of consumption.
  *
  * Not reference operators: the reference's time handling stops at
  * hourly census counts; these generalize that rollup to
  * order-sensitive aggregates and to a DENSE series (every bucket
  * present, values carried forward), the form window features and
  * joins downstream expect.
  *
  * Scale shape:
  *  - [[downsampleOhlc]] buckets by `date_trunc` and makes ONE
  *    exchange on `(key..., bucket)`: the open/close positions come
  *    from two `row_number` windows over that same partitioning —
  *    the following aggregate reuses the exchange, so the whole bar
  *    computation is one shuffle of the fact stream, and a
  *    partition is one bucket of one key, never the full history.
  *    Ties at the same timestamp resolve by the caller's `tie`
  *    column (a unique id) — deterministic bars under any physical
  *    row order, spec-pinned.
  *  - [[gapFillForward]] expands each key's `[min, max]` bucket
  *    span with `sequence()` — grid size is keys × span-buckets, a
  *    TIME-dimension cost independent of corpus size — left-joins
  *    the actual bars back, and forward-fills with one running
  *    `last(ignoreNulls)` window per key. Sums stay on
  *    DECIMAL(18,2) (the q20 discipline) so bars are exact and
  *    partial-aggregation-order-free.
  */
object TimeSeries {

  /** OHLC bars `(key..., bucket, open, high, low, close, n_events,
    * sum_value)` per `date_trunc(unit)` bucket. `open`/`close` are
    * the value at the earliest/latest `(ts, tie)` in the bucket
    * (null if that event's value is null — position, not
    * null-skipping, decides); `high`/`low` ignore nulls as plain
    * max/min. */
  def downsampleOhlc(events: DataFrame, keys: Seq[String], ts: Column,
                     value: Column, tie: Column,
                     unit: String = "hour"): DataFrame = {
    val keyed = events.select(
      (keys.map(col) :+ date_trunc(unit, ts).as("bucket") :+
        ts.as("__ts") :+ tie.as("__tie") :+ value.as("__v")): _*)
    val part = Window.partitionBy((keys :+ "bucket").map(col): _*)
    keyed
      .withColumn("__rn_a", row_number().over(
        part.orderBy(col("__ts").asc, col("__tie").asc)))
      .withColumn("__rn_d", row_number().over(
        part.orderBy(col("__ts").desc, col("__tie").desc)))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(
        max(when(col("__rn_a") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rn_d") === 1, col("__v"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("__v").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
  }

  /** Rolling z-score anomaly flags over a bar series: for each bar,
    * compare `value` against the mean/std of the PREVIOUS `lookback`
    * bars (the bar itself excluded — no self-masking), emitting
    * `(key..., bucket, <value>, z, is_anomaly)` for bars with a full
    * lookback window and positive variance.
    *
    * The Stats discipline: the window sums (`Σv, Σv²`) ride
    * DECIMAL(18,2)/(·,4) — exact, order-free — and the z closed form
    * is one fixed IEEE double tree (`z = (v − Σv/L) /
    * sqrt((L·Σv² − (Σv)²)/L²)`), so flags replay bit-identically in
    * SQL. Windows partition per key: thousands of small partitions,
    * never a global sort. Zero-variance windows are filtered, not
    * emitted as engine-dependent Inf/NaN. */
  def rollingZScore(series: DataFrame, keys: Seq[String], bucket: String,
                    value: String, lookback: Int = 7,
                    zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bucket))
      .rowsBetween(-lookback, -1)
    val vd = col(value).cast("decimal(18,2)")
    val ld = lit(lookback.toDouble)
    val withSums = series
      .withColumn("__cnt", count(vd).over(w))
      .withColumn("__s", sum(vd).over(w))
      .withColumn("__ss", sum(vd * vd).over(w))
      .where(col("__cnt") === lookback)
    val sd = col("__s").cast("double"); val ssd = col("__ss").cast("double")
    val varNum = ld * ssd - sd * sd
    val z = (col(value).cast("double") - sd / ld) /
      sqrt(varNum / (ld * ld))
    withSums
      .where(varNum > 0.0)
      .select((keys.map(col) :+ col(bucket) :+ col(value) :+
        z.as("z") :+
        when(abs(z) > zThreshold, 1).otherwise(0).as("is_anomaly")): _*)
  }

  /** Dense forward-filled series `(key..., bucket, <value>_filled,
    * filled)`: every `step` bucket of each key's `[min, max]` span,
    * `<value>_filled` = the last non-null value at or before the
    * bucket, `filled` = 1 where the bucket had no value of its own.
    * Buckets before a key's first value stay null (nothing to carry
    * — the flag still marks them). */
  def gapFillForward(series: DataFrame, keys: Seq[String],
                     bucket: String, value: String,
                     step: Column = expr("INTERVAL 1 HOUR")): DataFrame = {
    val grid = series
      .groupBy(keys.map(col): _*)
      .agg(min(col(bucket)).as("__lo"), max(col(bucket)).as("__hi"))
      .select((keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), step)).as(bucket)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(series.select((keys :+ bucket :+ value).map(col): _*),
        keys :+ bucket, "left")
      .select((keys.map(col) :+ col(bucket) :+
        last(col(value), ignoreNulls = true).over(w)
          .as(s"${value}_filled") :+
        when(col(value).isNull, 1).otherwise(0).as("filled")): _*)
  }
}
