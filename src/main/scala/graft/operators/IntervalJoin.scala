package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (time-range) join with ACTUAL/PLAN classification.
  *
  * Reference semantics (code/ukg_open_census.py:729-730): census rows
  * join schedule zones on location; rows whose census time falls
  * inside [startTime, endTime] are ACTUAL, later zones are PLAN, and
  * zones that already ended are dropped (`endTime >= CENSUS_DTTM`).
  *
  * Scale: zones are a dimension (locations × few zones/day) — tiny
  * next to the fact stream even at 100 TB — so the join is an
  * equi-join on the key with the range predicate applied post-match,
  * and the zone side is broadcast: no fact shuffle at all.
  */
object IntervalJoin {

  def classify(facts: DataFrame, zones: DataFrame, key: Seq[String],
               ts: Column, zStart: Column, zEnd: Column,
               planCol: String = "plan_type"): DataFrame =
    facts
      .join(broadcast(zones), key)
      .where(zEnd >= ts)
      .withColumn(planCol,
        when(ts >= zStart && ts <= zEnd, lit("ACTUAL")).otherwise(lit("PLAN")))
}
