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
    * @param tolerance  max lookback (backward) / lookahead (forward)
    *                   / |distance| (nearest) as an interval Column
    *                   (e.g. `expr("INTERVAL 1 HOUR")`); None =
    *                   unbounded
    * @param direction  `"backward"` (default — latest right with
    *                   `rightTs <= leftTs`), `"forward"` (earliest
    *                   right with `rightTs >= leftTs` — pandas
    *                   `merge_asof(direction='forward')`), or
    *                   `"nearest"` (whichever of the two is closer
    *                   in time; an exact tie resolves BACKWARD,
    *                   documented and spec-pinned). Forward is the
    *                   same one-exchange running-`last` scanned in
    *                   DESCENDING time (rights still sort before
    *                   lefts at an equal timestamp — the inclusive
    *                   boundary — and equal-(key, ts) rights still
    *                   resolve to the max tieBreak). Nearest runs
    *                   BOTH windows over the one union: the second
    *                   window shares the first's hash partitioning,
    *                   so the plan pays one extra SORT, never a
    *                   second Exchange. A left row with a null
    *                   `leftTs` matches nothing in every direction. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           tieBreak: String, tolerance: Option[Column] = None,
           direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    // __m/__mb/__mf are created via withColumn below: a left column
    // of those names would be silently overwritten
    val reserved = Seq("__ts", "__side", "__r", "__m", "__mb", "__mf")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString(", ")} are reserved")
    val rTagged = right.where(col(rightTs).isNotNull).select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct((col(rightTs).as("__rts") +: col(tieBreak).as("__tie") +:
          payload.filter(_ != tieBreak).map(col)): _*).as("__r")): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val tie = col("__r").getField("__tie")
    // backward scan: time ascending; rights (side 0) before lefts at
    // an equal ts (inclusive boundary); equal-(key, ts) rights tie
    // ascending so the running `last` resolves to the max tieBreak.
    // A null left ts sorts FIRST (asc nulls-first) and sees no right.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward scan: time DESCENDING — the running `last` at a left
    // row is then the SMALLEST right ts still >= it; same side and
    // tie discipline. A null left ts sorts LAST under desc and would
    // spuriously see the earliest right, so forward matches are
    // explicitly nulled on null-ts lefts below.
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = lTagged.unionByName(rTagged, allowMissingColumns = true)
    def gateB(m: Column): Column = tolerance match {
      case Some(tol) =>
        when(m.getField("__rts") >= col("__ts") - tol, m)
      case None => m
    }
    def gateF(m: Column): Column = {
      val g = when(col("__ts").isNull, lit(null)).otherwise(m)
      tolerance match {
        case Some(tol) => when(g.getField("__rts") <= col("__ts") + tol, g)
        case None => g
      }
    }
    val matched = direction match {
      case "backward" =>
        base.withColumn("__m",
          gateB(last(col("__r"), ignoreNulls = true).over(wB)))
      case "forward" =>
        base.withColumn("__m",
          gateF(last(col("__r"), ignoreNulls = true).over(wF)))
      case "nearest" =>
        // both candidates from the one union; exact |distance| tie
        // resolves backward (full-precision micros, no truncation)
        val db = unix_micros(col("__ts")) -
          unix_micros(col("__mb").getField("__rts"))
        val df = unix_micros(col("__mf").getField("__rts")) -
          unix_micros(col("__ts"))
        base
          .withColumn("__mb",
            gateB(last(col("__r"), ignoreNulls = true).over(wB)))
          .withColumn("__mf",
            gateF(last(col("__r"), ignoreNulls = true).over(wF)))
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(db <= df, col("__mb"))
              .otherwise(col("__mf")))
    }
    matched.where(col("__side") === 1).select(
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
