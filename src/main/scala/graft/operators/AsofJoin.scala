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
    val reserved = Seq("__ts", "__side", "__r")
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
}
