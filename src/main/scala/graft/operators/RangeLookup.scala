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
}
