package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-table lookup: the staffing-matrix pattern.
  *
  * The reference's staffing matrix (code/ukg_stf_matrx.py:121-155,
  * ddl/ukg_stf_matrx_range.py) is a table of [LOW_RANGE, HI_RANGE] →
  * STF_CNT rows; a census value is looked up by range membership.
  *
  * Scale: the range table is small by construction (matrices ×
  * ranges), so this is a broadcast join with a non-equi predicate —
  * a BroadcastNestedLoopJoin over a dim of a few thousand rows, one
  * pass over the facts, no shuffle. If ranges were large, the scale
  * path is binning both sides to an equi-join on a bucket key.
  */
object RangeLookup {

  def lookup(facts: DataFrame, ranges: DataFrame,
             value: Column, low: Column, high: Column): DataFrame =
    facts.join(broadcast(ranges), value >= low && value <= high)

  /** The large-range-table path: bin both sides to `binWidth`-wide
    * buckets so the join is an equi-join on the bin id — each range
    * explodes to the bins it overlaps (ceil(span/binWidth) + 1 rows),
    * each fact maps to exactly one bin, and the exact BETWEEN check
    * runs as a post-join residual filter. Cost is |facts| +
    * Σ range-spans/binWidth shuffled on the bin key, versus the
    * broadcast variant's |facts| × |ranges| comparisons — the
    * composed-built-ins realization of a range join (no custom
    * Strategy needed: Catalyst sees a plain equi-join and plans a
    * shuffled hash join with AQE skew handling).
    *
    * `binWidth` tunes the duplication factor: ~the median range span
    * keeps each range in O(1) bins.
    */
  def lookupBinned(facts: DataFrame, ranges: DataFrame,
                   value: Column, low: Column, high: Column,
                   binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    val rBinned = ranges.select(col("*"),
        explode(sequence(floor(low / binWidth).cast("long"),
          floor(high / binWidth).cast("long"))).as("__bin"))
    facts.select(col("*"), floor(value / binWidth).cast("long").as("__bin"))
      .join(rBinned, "__bin")
      .where(value >= low && value <= high)
      .drop("__bin")
  }
}
