package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Log-linear quantile histogram (the HdrHistogram layout, Tene;
  * the mergeable-quantile-sketch family of DDSketch, Masson,
  * Rim & Lee, VLDB 2019) over non-negative integer measures —
  * distribution questions ("p50/p99 sequence length, per source")
  * answered from a fixed ~`(64−b)·2^b`-bucket artifact instead of a
  * corpus-sized sort.
  *
  * Not a reference operator: the fourth member of the sketch suite
  * this engine adds beyond the reference's ETL scope (frequency =
  * [[Sketch]], cardinality = [[Hll]], membership = [[Bloom]],
  * quantiles = this). Complements `q_length_quantiles`'s exact
  * `percentile` and `q_tokenlen_quantiles_approx`'s GK
  * `approx_percentile` with what neither gives: the HISTOGRAM as a
  * first-class DataFrame artifact — persistable, mergeable
  * ([[merge]] == one-shot on the union, bucket-for-bucket, the
  * plain-count SUM identity [[Sketch.cmsMerge]] has), group-keyed,
  * and — unlike every other sketch in the suite — built from pure
  * integer arithmetic with NO hash at all, so there is no
  * seeded/xxhash64 twin split: the frame AND every read surface
  * replay bit-identically in ANSI SQL, oracle-green outright.
  *
  * Bucket layout (`b` sub-bucket bits; base-2 log-linear): for
  * `v ≥ 0` with `e = floor(log2 v)` (printed-binary length − 1 —
  * Spark's `bin` and DuckDB's `bin` both print the no-leading-zeros
  * form, the [[Hll]] portability trick),
  * `s = max(e − b, 0)` and `m = v >> s`, giving bucket id
  * `idx = s·2^(b+1) + m` with bounds `lo = m << s`,
  * `hi = ((m+1) << s) − 1`. `idx` is monotone in `v` (within a
  * scale `m` grows with `v`; across scales the first bucket of
  * `s+1` outranks the last of `s` — spec-pinned), so rank
  * arithmetic over the frame IS rank arithmetic over the values.
  * Values below `2^(b+1)` occupy singleton buckets (`s = 0`,
  * `lo == v == hi` — the exact region); above, bucket width
  * `2^s ≤ lo·2^−b`, the relative-error guarantee.
  *
  * Scale shape (the [[Sketch]] discipline):
  *  - [[frame]] is scan → integer bucket arithmetic → ONE
  *    `idx`-keyed count. Partial aggregation reduces every task to
  *    at most `(64−b)·2^(b+1)` buckets BEFORE the exchange
  *    (~2k rows at `b = 5`) — the measure stream never crosses the
  *    wire, only per-task histograms do.
  *  - Buckets are plain counts, so they SUM under corpus union:
  *    appending a day's batch to a persisted frame is a
  *    frame-sized aggregate of the BATCH alone, and a
  *    Structured-Streaming frame is a plain running count
  *    (`streamHdrFrame`), state bounded by the bucket count.
  *  - [[quantiles]] folds the frame alone: a cumulative window over
  *    ≤ ~2k buckets per group, cross-joined with the probe ranks.
  *    The corpus is not touched.
  *
  * Estimate semantics: `est(q)` = the `lo` of the first bucket (in
  * `idx` order) whose cumulative count reaches rank
  * `max(ceil(q·n), 1)` — the `percentile_disc` convention read off
  * the histogram. The rank-`r` value itself lies in that bucket, so
  * `est ≤ true ≤ est + (width − 1)`: one-sided from below with
  * relative error ≤ 2^−b (exact in the singleton region) —
  * spec-pinned against exact `percentile_disc` on planted uniform /
  * zipf / constant distributions.
  */
object Hdr {

  /** Default sub-bucket bits: width ≤ lo/32 ⇒ ≤ 3.1% relative
    * error, ≤ ~2k buckets over the full Long range. */
  val DefaultBits = 5

  /** Bucket arithmetic for a non-negative long measure `v`:
    * `(s, m, idx, lo, hi)` columns appended to a frame holding `v`.
    * Shift counts are data-dependent, so the shifts go through the
    * SQL `shiftright`/`shiftleft` (column shift operand — the
    * `functions._` wrappers only take literal shifts); exact
    * integer arithmetic end-to-end, engine-portable. */
  private def bucketized(withV: DataFrame, b: Int): DataFrame =
    withV
      .withColumn("e", (length(bin(col("v"))) - 1).cast("int"))
      .withColumn("s", greatest(col("e") - lit(b), lit(0)))
      .withColumn("m", expr("shiftright(v, s)"))
      .withColumn("idx",
        col("s").cast("long") * lit((1L << (b + 1))) + col("m"))
      .withColumn("lo", expr("shiftleft(m, s)"))
      // hi = lo + (width - 1), not ((m+1) << s) - 1: anything that
      // computes lo + width overflows a Long on the top bucket
      // (ANSI mode throws); width - 1 first keeps every
      // intermediate inside the Long range
      .withColumn("hi",
        col("lo") + (expr("shiftleft(CAST(1 AS BIGINT), s)") - 1))

  /** The sketch: `(group..., idx, lo, hi, cnt)` — the measure
    * distribution folded into log-linear buckets. Only touched
    * buckets appear (absent bucket == 0); at most
    * `(64−b)·2^(b+1)` rows per group regardless of corpus size.
    * Negative and null measures are excluded (the caller's
    * contract: measures are counts/lengths/sizes).
    *
    * `weight` (integer, default 1 per row) turns the frame into a
    * weighted histogram — `cnt` becomes the bucket's weight MASS —
    * and every downstream read ([[quantiles]], [[merge]],
    * [[bucketByQuantiles]]) works unchanged: a weighted quantile is
    * just rank arithmetic over masses. Weighting the measure by
    * ITSELF (`weight = value`) gives the mass distribution — e.g.
    * "the median TOKEN sits in a doc of length ~X", the statistic
    * sequence packing actually plans against. */
  def frame(df: DataFrame, value: Column, b: Int = DefaultBits,
            groupCols: Seq[String] = Nil,
            weight: Column = lit(1L)): DataFrame = {
    require(b >= 1 && b <= 16, s"sub-bucket bits must be in [1,16], got $b")
    val keyed = df.where(value.isNotNull && value >= 0)
      .select((groupCols.map(col) :+ value.cast("long").as("v") :+
        weight.cast("long").as("__w")): _*)
    bucketized(keyed, b)
      .groupBy((groupCols ++ Seq("idx", "lo", "hi")).map(col): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Bucket-wise sum of two frames (same `b` and group keys — the
    * caller's contract, as `Sketch.cmsMerge`). Plain counts SUM
    * under disjoint union: `merge(hdr(A), hdr(B)) == hdr(A ⊎ B)`
    * bucket-for-bucket — the append/streaming identity. */
  def merge(a: DataFrame, other: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "cnt").toSeq
    a.unionByName(other)
      .groupBy(keys.map(col): _*).agg(sum(col("cnt")).as("cnt"))
  }

  /** Read quantiles off a frame: `(group..., q, n, est)` for each
    * probe `q` — `n` the group's total count, `est` the `lo` of the
    * first bucket whose cumulative count reaches rank
    * `max(ceil(q·n), 1)`. Frame-sized work only: a cumulative
    * window over the buckets (partitioned by group), a cross join
    * against the ≤ handful of probe ranks, one min per `(group, q)`.
    * The `ceil(q·n)` multiply is the suite's one double op —
    * IEEE-identical across engines (the `Hll.hllEstimate`
    * division-only discipline). */
  def quantiles(frame: DataFrame, qs: Seq[Double],
                groupCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantile probes must lie in [0,1]")
    val part =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = frame.select(
      (groupCols.map(col) :+ col("idx") :+ col("lo") :+
        sum(col("cnt")).over(part.orderBy(col("idx"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum") :+
        sum(col("cnt")).over(part).as("n")): _*)
    // probe ranks ride as an exploded literal array — no join node at
    // all (a crossJoin against the handful-of-rows probe frame would
    // plan a broadcast nested loop; this stays in the window's stage)
    cum.withColumn("q", explode(array(qs.distinct.sorted.map(lit): _*)))
      .where(col("cum") >=
        greatest(ceil(col("q") * col("n").cast("double")), lit(1L)))
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(min(col("n")).as("n"), min(col("lo")).as("est"))
  }

  /** Coarsen a frame to fewer sub-bucket bits WITHOUT rescanning
    * the corpus: `coarsen(frame(df, b), b, b') == frame(df, b')`
    * bucket-for-bucket, EXACTLY (spec-pinned). Why exact: every
    * value in a fine bucket shares its floor-log2 (the bucket span
    * never crosses a power of two), so the whole bucket maps into
    * ONE coarse bucket — re-bucketing the bucket's `lo` as a
    * witness value and summing counts is the entire operation,
    * frame-sized. This is the multi-resolution story: persist at
    * b=8, serve any coarser resolution later without the corpus.
    *
    * Group-keyed frames (built with `frame(groupCols = ...)`) pass
    * the SAME `groupCols` here — coarsening happens within each
    * group. The input's columns must be exactly
    * `groupCols ++ (idx, lo, hi, cnt)`: an unexpected extra column
    * means a group key the caller forgot, and silently collapsing
    * it into one global histogram is the wrong-result trap this
    * require exists to catch. */
  def coarsen(frame: DataFrame, bFrom: Int, bTo: Int,
              groupCols: Seq[String] = Nil): DataFrame = {
    require(bTo >= 1 && bTo < bFrom,
      s"can only coarsen: need 1 <= bTo < bFrom, got $bFrom -> $bTo")
    val expected = (groupCols ++ Seq("idx", "lo", "hi", "cnt")).toSet
    require(frame.columns.toSet == expected,
      s"coarsen: frame columns ${frame.columns.mkString(",")} != " +
        s"groupCols ++ (idx,lo,hi,cnt) — pass the frame's group keys")
    bucketized(frame.select(
        (groupCols.map(col) :+ col("lo").as("v") :+ col("cnt")): _*), bTo)
      .groupBy((groupCols ++ Seq("idx", "lo", "hi")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile binning: assign each row the bucket of its measure
    * among `nBuckets` sketch-quantile thresholds (`q = 1/k ..
    * (k−1)/k`) — `bucket = 1 + |{threshold ≤ v}|`, a value equal to
    * a threshold goes UP. This is the scale replacement for a
    * global `ntile` sort: thresholds come off the ≤ ~2k-bucket
    * frame, travel as ONE broadcast row (a sorted array), and the
    * assignment is a per-row lambda over that array — the corpus is
    * scanned once, never sorted. Duplicate thresholds (a mass point
    * spanning several probes) collapse buckets, deterministically —
    * the histogram convention, spec-pinned against a straight-line
    * replay. */
  def bucketByQuantiles(df: DataFrame, value: Column, nBuckets: Int = 10,
                        b: Int = DefaultBits): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val ths = quantiles(frame(df, value, b), qs)
      .agg(sort_array(collect_list(col("est"))).as("__ths"))
    df.where(value.isNotNull && value >= 0)
      .crossJoin(broadcast(ths))
      .withColumn("bucket",
        (lit(1) + size(filter(col("__ths"), t => t <= value)))
          .cast("long"))
      .drop("__ths")
  }

  /** End-to-end: the sequence-length (whitespace-token-count)
    * distribution frame of a document corpus — the measure every
    * packing / curriculum / token-budget stage keys on. */
  def tokenLengthFrame(df: DataFrame, text: Column,
                       b: Int = DefaultBits,
                       groupCols: Seq[String] = Nil): DataFrame =
    frame(df.where(text.isNotNull), size(TextFns.tokens(text)).cast("long"),
      b, groupCols)

  /** End-to-end: sequence-length quantiles, optionally per group. */
  def tokenLengthQuantiles(df: DataFrame, text: Column, qs: Seq[Double],
                           b: Int = DefaultBits,
                           groupCols: Seq[String] = Nil): DataFrame =
    quantiles(tokenLengthFrame(df, text, b, groupCols), qs, groupCols)
}
