package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks the LATEST right
  * row with the same key and `rightTs <= leftTs` (backward as-of,
  * the pandas `merge_asof` / kdb `aj` semantics), optionally within
  * a tolerance window.
  *
  * Not a reference operator: the reference's interval join
  * ([[IntervalJoin]], ukg_open_census.py:729-730) classifies facts
  * against a broadcastable zone DIMENSION; as-of joins two
  * time-keyed FACT streams (events to the latest preceding event,
  * readings to the last calibration, trades to quotes), where no
  * side is broadcastable and a range theta-join would explode.
  *
  * Scale shape — the reason this is an operator and not a join hint:
  *  - A naive formulation (`l JOIN r ON key AND r.ts <= l.ts` + keep
  *    latest) is a range theta-join: Spark plans it as a per-key
  *    cross product — quadratic in events-per-key, hopeless at
  *    100 TB. This operator instead UNION-TAGS the two sides, makes
  *    ONE exchange on the key, sorts each partition once by
  *    `(ts, side, tie)`, and takes a running `last(right payload,
  *    ignoreNulls)` — the sort-merge as-of: linear work after one
  *    shuffle per side, the same cost class as the join both sides
  *    already paid for their own aggregations.
  *  - Right rows sort BEFORE left rows at an equal timestamp
  *    (`side` 0 < 1), so a right row exactly at `leftTs` matches —
  *    the inclusive boundary, spec-pinned.
  *  - Ties among right rows at the same `(key, ts)` resolve to the
  *    max `tieBreak` (they sort ascending and `last` wins) —
  *    deterministic output under any physical row order,
  *    spec-pinned. The payload travels as ONE struct so the matched
  *    id/value/ts always come from the SAME right row even when
  *    payload columns hold nulls.
  *  - Skew: a hot key's partition holds its own events only — the
  *    window is a running `last`, one pass, no per-row backscan; at
  *    1000 executors the cost of a hot key is reading it, not
  *    re-scanning it per probe.
  *  - Null timestamps: a right row with a null `rightTs` is DROPPED
  *    (a time it never happened at can't be "latest"; without the
  *    filter Spark's nulls-first ascending sort would place it
  *    before every real row and make it the running-last match for
  *    left rows that have no true predecessor — a spurious payload
  *    where the contract says null). A left row with a null
  *    `leftTs` is KEPT and matches nothing (it sorts before every
  *    surviving right row, so the running `last` is null) — the
  *    row-preserving analog of pandas `merge_asof`'s null
  *    rejection, spec-pinned.
  *  - `tolerance` does NOT re-join: the latest match is kept iff
  *    `matchedTs >= leftTs − tolerance`, which is equivalent to
  *    as-of-joining within the window (any older candidate is
  *    further outside), spec-pinned. Interval arithmetic stays on
  *    full-precision timestamps — no epoch-seconds truncation at
  *    the boundary.
  *
  * Output: every left column, plus each right payload column as
  * `asof_<name>` (null when no match / outside tolerance).
  */
object AsofJoin {

  /** @param keys       equality key columns present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns carried to the output
    *                   (`asof_`-prefixed); include the right ts name
    *                   here if the caller wants the matched time
    * @param tieBreak   right column resolving equal-(key, ts) rights
    *                   (max wins) — a unique id makes the join
    *                   deterministic
    * @param tolerance  max lookback as an interval Column
    *                   (e.g. `expr("INTERVAL 1 HOUR")`); None =
    *                   unbounded */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           tieBreak: String, tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    // __m is created via withColumn below: a left column of that name
    // would be silently overwritten and re-read as the match struct
    val reserved = Seq("__ts", "__side", "__r", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString(", ")} are reserved")
    val rTagged = right.where(col(rightTs).isNotNull).select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct((col(rightTs).as("__rts") +: col(tieBreak).as("__tie") +:
          payload.filter(_ != tieBreak).map(col)): _*).as("__r")): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r").getField("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val gated = tolerance match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__m").getField("__rts") >= col("__ts") - tol, col("__m")))
      case None => matched
    }
    gated.select(
      (left.columns.map(col).toSeq ++ payload.map { p =>
        val f = if (p == tieBreak) "__tie" else p
        col("__m").getField(f).as(s"asof_$p")
      }): _*)
  }

  /** [[asof]] with TIME-SLICED salting for the pathological skew
    * case: one key owning (nearly) the whole stream. The plain as-of
    * is linear after one exchange, but the linear pass over a key
    * runs in ONE task — a single key = the whole stream means one
    * partition sorts everything while the other 999 executors idle.
    * That single-partition sort is the bound this variant removes.
    *
    * Construction: the union-tagged stream is cut into `slices`
    * TIME-CONTIGUOUS slices (boundaries from an approx-quantile pass
    * over the union's timestamps, so slices balance under time
    * clustering; pass `boundaries` to skip that pass). The running
    * `last` then partitions by `(key..., slice)` — the hot key's
    * sort spreads across `slices` tasks. Within-slice matches are
    * exact; a left row whose predecessor lies in an EARLIER slice
    * takes the boundary carry: per `(key, slice)` the latest right
    * struct (`max_by (ts, tie)` — an aggregate, not a sort), then a
    * running `last` over the slice sequence per key. Slices are
    * time-ordered and slice assignment is a pure function of the
    * timestamp (equal timestamps share a slice), so the most recent
    * earlier slice's max IS the latest earlier right — `coalesce
    * (within-slice, carry)` reproduces [[asof]] EXACTLY, any slice
    * count, spec-pinned.
    *
    * What the salt trades: one extra pass over the union for the
    * boundaries (skippable), one keys·slices-row aggregate joined
    * back hint-free (AQE broadcasts it when the key domain is
    * dimension-sized; a high-cardinality domain degrades to a
    * shuffle join that reuses the window's partitioning — never a
    * forced driver-sized broadcast), and a second sort key column —
    * ~1–2 s of fixed overhead at local[32]. MEASURED crossover
    * (AsofBench salted arm, bench_asof_r12_h*): at 400k union rows
    * even a 100%-hot key sorts in one task in < 1 s and the salt
    * LOSES (0.38–0.66× across hot 20/50/90/100 — the fixed costs,
    * not the sort, dominate); at 10M union rows on ONE key the
    * single-task sort is 26–32 s and the salt serves it in 4–5 s —
    * **6.3–6.8×** across two quiet runs (identity-asserted both
    * arms, every rung). Rule:
    * stay on [[asof]] until the hottest key's row count per task
    * clears ~1M; switch (or pre-split by a coarser key) past it. */
  def asofSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String, payload: Seq[String],
                 tieBreak: String, tolerance: Option[Column] = None,
                 slices: Int = 32,
                 boundaries: Option[Seq[Long]] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(slices >= 1, "slices must be >= 1")
    val reserved = Seq("__ts", "__side", "__r", "__slice", "__m", "__carry")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString(", ")} are reserved")
    val rTagged = right.where(col(rightTs).isNotNull).select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct((col(rightTs).as("__rts") +: col(tieBreak).as("__tie") +:
          payload.filter(_ != tieBreak).map(col)): _*).as("__r")): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val union = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // time-contiguous slice of a timestamp: count of boundaries <= ts
    // (pure function of ts — equal timestamps always share a slice);
    // null ts (left-only) slices to 0, before every real row
    val cutsSeq: Seq[Long] =
      if (slices == 1) Nil
      else boundaries.getOrElse {
        union.select(unix_micros(col("__ts")).cast("double").as("__us"))
          .na.drop()
          .stat.approxQuantile("__us",
            (1 until slices).map(_.toDouble / slices).toArray, 0.001)
          .map(_.toLong).toSeq.distinct
      }
    val sliceOf: Column =
      if (cutsSeq.isEmpty) lit(0)
      else cutsSeq.map(c =>
        when(unix_micros(col("__ts")) >= c, 1).otherwise(0))
        .reduce(_ + _)
    val sliced = union.withColumn("__slice", sliceOf)
    val w = Window.partitionBy((keys.map(col) :+ col("__slice")): _*)
      .orderBy(col("__ts"), col("__side"), col("__r").getField("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sliced
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // boundary carry: latest right struct of every EARLIER slice —
    // an aggregate over (key, slice) then a running last over the
    // slice sequence; keys·slices rows, joined back hint-free. The
    // aggregate runs over BOTH sides so every (key, slice) a left
    // row lives in gets a carry row even when that slice holds no
    // rights (`max_by`'s ordering is null for left rows, which it
    // ignores; an all-left slice yields a null __last the running
    // `last(ignoreNulls)` skips — the carry then reaches back to
    // the most recent right-bearing slice, exactly the semantics)
    val carryW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sliced
      .groupBy((keys.map(col) :+ col("__slice")): _*)
      .agg(max_by(col("__r"),
        when(col("__side") === 0, struct(col("__r").getField("__rts"),
          col("__r").getField("__tie")))).as("__last"))
      .select((keys.map(col) :+ col("__slice") :+
        last(col("__last"), ignoreNulls = true).over(carryW)
          .as("__carry")): _*)
    // hint-free on purpose: the carry is keys·slices rows — KBs for
    // a dimension-sized key domain (AQE broadcasts it), but a
    // HIGH-CARDINALITY key domain (millions of cold keys riding one
    // hot one — the realistic skew shape) makes it data-sized, and a
    // forced broadcast() would bypass autoBroadcastJoinThreshold
    // straight into a driver OOM. Unhinted, Spark degrades to a
    // shuffle join whose left side is ALREADY partitioned by
    // (keys, slice) from the window — no extra exchange of the data.
    val matched = within
      .join(carry, keys :+ "__slice", "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
    val gated = tolerance match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__m").getField("__rts") >= col("__ts") - tol, col("__m")))
      case None => matched
    }
    gated.select(
      (left.columns.map(col).toSeq ++ payload.map { p =>
        val f = if (p == tieBreak) "__tie" else p
        col("__m").getField(f).as(s"asof_$p")
      }): _*)
  }
}
