package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event
  * stream — the two classic product-analytics operators, built the
  * Spark-first way: per-stage grouped minima chained by joins (no
  * per-user event-list collection, no UDFs), so every step is a
  * key-partitioned aggregate the optimizer can reuse the exchange
  * for.
  *
  * Not reference operators: the reference's event handling stops at
  * hourly census rollups (ukg_open_census.py's census CTEs); funnel
  * and retention are the event-stream questions an analytics engine
  * over the same data is expected to answer.
  *
  * Funnel semantics ([[stageTimes]]): stage 1's time is the user's
  * earliest stage-1 event; stage i+1's time is the earliest
  * stage-i+1 event AT OR AFTER the user's stage-i time (inclusive
  * boundary, spec-pinned — an event at the very same timestamp
  * counts as progression). A user's funnel row carries every
  * reached stage's time, nulls after the first missed stage — by
  * construction `ts_1 <= ts_2 <= ... <= ts_k` over the non-null
  * prefix.
  *
  * Scale shape:
  *  - k stages = k grouped `min`s + (k−1) equi-joins, ALL keyed on
  *    the user — one logical partitioning reused end-to-end; each
  *    stage's input is the event subset of that type (filter pushed
  *    to the scan), never the full stream re-sorted.
  *  - No window over the whole event history and no
  *    `collect_list`: a hot user costs its own event count per
  *    stage, not a quadratic backscan.
  *  - Retention ([[retention]]) is two grouped aggregates (first
  *    activity, distinct active weeks) joined on the user, then a
  *    cohort-keyed count — the user-distinct shuffle is the one
  *    unavoidable exchange; week arithmetic stays on `date_trunc`
  *    + integer day-diff division (exact, engine-portable).
  */
object EventAnalytics {

  /** Per-user funnel times `(user, ts_1 ... ts_k)`, nulls from the
    * first missed stage on. `stages` are matched against `typ` in
    * order. */
  def stageTimes(events: DataFrame, user: String, ts: Column,
                 typ: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.where(typ === stages.head)
      .groupBy(col(user)).agg(min(ts).as("ts_1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"ts_$i"
      val next = s"ts_${i + 1}"
      val nxt = events.where(typ === st)
        .join(acc.select(col(user), col(prev)), user)
        .where(ts >= col(prev))
        .groupBy(col(user)).agg(min(ts).as(next))
      acc.join(nxt.select(col(user), col(next)), Seq(user), "left")
    }
  }

  /** The funnel rollup `(stage, stage_name, n_users)`: how many
    * users reached each stage (non-null stage time). */
  def funnelCounts(events: DataFrame, user: String, ts: Column,
                   typ: Column, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, user, ts, typ, stages)
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      times.agg(
        lit(i + 1L).as("stage"),
        lit(st).as("stage_name"),
        count(col(s"ts_${i + 1}")).as("n_users"))
    }
    perStage.reduce(_.unionByName(_))
  }

  /** Per-user funnel depth `(user, stages_completed)` — the length
    * of the non-null stage-time prefix (0 never appears: users with
    * no stage-1 event have no row). */
  def funnelDepth(events: DataFrame, user: String, ts: Column,
                  typ: Column, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, user, ts, typ, stages)
    val depth = stages.indices.map { i =>
      when(col(s"ts_${i + 1}").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    // nulls only ever trail (ts_{i+1} needs ts_i), so the sum of
    // non-null flags IS the prefix length
    times.select(col(user), depth.as("stages_completed"))
  }

  /** Weekly cohort retention `(cohort_week, week_offset, n_users)`:
    * users bucketed by the week of their first event; `n_users` =
    * distinct users of that cohort active `week_offset` weeks later
    * (offset 0 = the cohort week itself, so offset-0 `n_users` is
    * the cohort size). Weeks are `date_trunc('week', ts)` Mondays;
    * the offset is an exact integer day-diff / 7. */
  def retention(events: DataFrame, user: String, ts: Column): DataFrame = {
    val weeks = events.select(col(user),
      to_date(date_trunc("week", ts)).as("week"))
    val cohorts = weeks.groupBy(col(user))
      .agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(cohorts, user)
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
