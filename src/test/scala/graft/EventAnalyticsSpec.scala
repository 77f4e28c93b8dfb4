package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel and cohort-retention contracts: straight-line brute-force
  * parity (incl. a randomized corpus with dense timestamp
  * collisions), the inclusive same-timestamp progression boundary,
  * out-of-order events NOT counting (a click before the signup is
  * no progression), the trailing-nulls depth invariant, retention's
  * offset-0 == cohort size, and partition invariance. */
class EventAnalyticsSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stages = Seq("signup", "click", "purchase")

  /** Straight-line funnel: earliest stage-1, then earliest next
    * stage at or after the previous stage's time. */
  private def bruteFunnel(evs: Seq[(Long, String, Timestamp)])
      : Map[Long, Seq[Timestamp]] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val times = scala.collection.mutable.ArrayBuffer[Timestamp]()
      for (st <- stages) {
        val floor = times.lastOption
        val cands = es.filter { case (_, t, e) =>
          t == st && floor.forall(f => !e.before(f))
        }.map(_._3)
        if (cands.nonEmpty && times.size == stages.indexOf(st))
          times += cands.minBy(_.getTime)
      }
      if (times.isEmpty) None else Some(u -> times.toSeq)
    }

  // u1 completes all three; u2's click PRECEDES its signup (no
  // progression past stage 1); u3 progresses on equal timestamps
  // (inclusive boundary); u4 has no signup at all (absent from the
  // funnel even though it clicks and purchases)
  private val evs = Seq(
    (1L, "signup", ts("2026-01-05 10:00:00")),
    (1L, "click", ts("2026-01-05 11:00:00")),
    (1L, "click", ts("2026-01-05 09:00:00")), // pre-signup click: ignored
    (1L, "purchase", ts("2026-01-06 12:00:00")),
    (2L, "click", ts("2026-01-05 08:00:00")),
    (2L, "signup", ts("2026-01-05 09:00:00")),
    (3L, "signup", ts("2026-01-05 10:00:00")),
    (3L, "click", ts("2026-01-05 10:00:00")),
    (3L, "purchase", ts("2026-01-05 10:00:00")),
    (4L, "click", ts("2026-01-05 10:00:00")),
    (4L, "purchase", ts("2026-01-05 11:00:00")))

  private def df = evs.toDF("user_id", "event_type", "ts")

  test("stage times match the straight-line funnel; same-ts progression is inclusive") {
    val got = EventAnalytics.stageTimes(df, "user_id", col("ts"),
        col("event_type"), stages)
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getTimestamp(i)))
      }.toMap
    assert(got == bruteFunnel(evs))
    // pinned: u3 walks the whole funnel on one timestamp
    assert(got(3L).size == 3)
    // pinned: u2's pre-signup click is not progression
    assert(got(2L).size == 1)
    // pinned: u4 never enters the funnel
    assert(!got.contains(4L))
  }

  test("funnel counts and depth agree with the stage-time frame") {
    val counts = EventAnalytics.funnelCounts(df, "user_id", col("ts"),
        col("event_type"), stages)
      .as[(Long, String, Long)].collect()
      .map { case (s, n, c) => (s, n) -> c }.toMap
    assert(counts == Map((1L, "signup") -> 3L, (2L, "click") -> 2L,
      (3L, "purchase") -> 2L))
    val depth = EventAnalytics.funnelDepth(df, "user_id", col("ts"),
        col("event_type"), stages)
      .as[(Long, Long)].collect().toMap
    assert(depth == Map(1L -> 3L, 2L -> 1L, 3L -> 3L))
  }

  test("randomized brute-force parity (dense collisions, shuffled partitions)") {
    val rnd = new scala.util.Random(7)
    val types = Seq("signup", "click", "purchase", "view")
    val stamps = (0 until 6).map(h => ts(f"2026-03-01 0$h:00:00"))
    val random = (0 until 300).map { _ =>
      (rnd.nextInt(20).toLong, types(rnd.nextInt(4)), stamps(rnd.nextInt(6)))
    }
    val got = EventAnalytics.stageTimes(
        random.toDF("user_id", "event_type", "ts").repartition(13),
        "user_id", col("ts"), col("event_type"), stages)
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getTimestamp(i)))
      }.toMap
    assert(got == bruteFunnel(random))
  }

  test("retention: offset 0 equals cohort size; offsets are exact week multiples") {
    // two cohorts: week of Jan 5 (Mon) and week of Jan 12 (Mon);
    // u1 active weeks 0,1,3; u2 weeks 0,1; u3 (late cohort) week 0
    val revs = Seq(
      (1L, ts("2026-01-05 10:00:00")), (1L, ts("2026-01-07 10:00:00")),
      (1L, ts("2026-01-14 10:00:00")), (1L, ts("2026-01-26 10:00:00")),
      (2L, ts("2026-01-06 10:00:00")), (2L, ts("2026-01-12 10:00:00")),
      (3L, ts("2026-01-13 10:00:00")))
    val got = EventAnalytics.retention(
        revs.toDF("user_id", "ts"), "user_id", col("ts"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    assert(got == Map(
      ("2026-01-05", 0L) -> 2L, ("2026-01-05", 1L) -> 2L,
      ("2026-01-05", 3L) -> 1L, ("2026-01-12", 0L) -> 1L))
  }
}
