package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.etl.Scd

/** SCD Type-2 builder contracts: change compression (unchanged
  * re-deliveries collapse into the earlier interval — idempotent
  * ingest), null-safe attribute comparison (null → null is NOT a
  * change; null → value and value → null are), the first row of a
  * key always opening an interval even with a null attribute,
  * intervals tiling the key's history (valid_to == next
  * valid_from, exactly one is_current), equal-timestamp ties
  * resolved by the tie id, and partition invariance. */
class ScdSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // u1: a -> a (compressed) -> b -> b (compressed) -> a;
  // u2: null first row, null -> null compressed, null -> c a change;
  // u3: two changes at the SAME timestamp (ids 31, 32 — the later id
  // wins the open interval)
  private val evs = Seq(
    (10L, 1L, ts("2026-01-01 00:00:00"), "a"),
    (11L, 1L, ts("2026-01-01 01:00:00"), "a"),
    (12L, 1L, ts("2026-01-01 02:00:00"), "b"),
    (13L, 1L, ts("2026-01-01 03:00:00"), "b"),
    (14L, 1L, ts("2026-01-01 04:00:00"), "a"),
    (20L, 2L, ts("2026-01-01 00:00:00"), null: String),
    (21L, 2L, ts("2026-01-01 01:00:00"), null: String),
    (22L, 2L, ts("2026-01-01 02:00:00"), "c"),
    (31L, 3L, ts("2026-01-01 00:00:00"), "x"),
    (32L, 3L, ts("2026-01-01 00:00:00"), "y"))

  private def build(df: org.apache.spark.sql.DataFrame) =
    Scd.buildType2(df, Seq("user_id"), col("ts"), col("event_id"),
      Seq("event_type"))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    build(df).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getTimestamp(2).toString,
        if (r.isNullAt(3)) null else r.getTimestamp(3).toString,
        r.getInt(4))
    }.toSet

  private val want = Set(
    (1L, "a", "2026-01-01 00:00:00.0", "2026-01-01 02:00:00.0", 0),
    (1L, "b", "2026-01-01 02:00:00.0", "2026-01-01 04:00:00.0", 0),
    (1L, "a", "2026-01-01 04:00:00.0", null, 1),
    (2L, null, "2026-01-01 00:00:00.0", "2026-01-01 02:00:00.0", 0),
    (2L, "c", "2026-01-01 02:00:00.0", null, 1),
    (3L, "x", "2026-01-01 00:00:00.0", "2026-01-01 00:00:00.0", 0),
    (3L, "y", "2026-01-01 00:00:00.0", null, 1))

  test("intervals: compression, null-safe changes, null-attr first row, same-ts ties") {
    assert(collect(evs.toDF("event_id", "user_id", "ts", "event_type"))
      == want)
  }

  test("a null tie value does not fake a first row (change compression survives)") {
    // u5's first event carries a NULL tie id; the unchanged event
    // after it must still compress (lag(tie).isNull would have
    // misread it as a key's first row and re-opened the interval —
    // row_number detection is tie-nullability-independent)
    val rows = Seq(
      (null: java.lang.Long, 5L, ts("2026-01-01 00:00:00"), "a"),
      (java.lang.Long.valueOf(51L), 5L, ts("2026-01-01 01:00:00"), "a"),
      (java.lang.Long.valueOf(52L), 5L, ts("2026-01-01 02:00:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(collect(rows) == Set(
      (5L, "a", "2026-01-01 00:00:00.0", "2026-01-01 02:00:00.0", 0),
      (5L, "b", "2026-01-01 02:00:00.0", null, 1)))
  }

  test("idempotent ingest: tie-adjacent re-delivery does not split intervals") {
    // each duplicate's tie id lands directly after its original
    // (id*2, id*2+1), so it always follows an identical state and
    // compresses away — the adjacency the compression contract
    // requires (a duplicate re-ordered past a DIFFERENT same-ts
    // state legitimately re-opens; see the scaladoc)
    val redelivered = evs.flatMap { case (id, u, t, e) =>
      Seq((id * 2, u, t, e), (id * 2 + 1, u, t, e))
    }
    assert(collect(redelivered.toDF("event_id", "user_id", "ts", "event_type"))
      == want)
  }

  test("intervals tile: valid_to == next valid_from; exactly one is_current per key") {
    val rows = build(evs.toDF("event_id", "user_id", "ts", "event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2.getTime)
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._2.compareTo(b._2) <= 0)
        assert(a._3.contains(b._2), s"u=$u gap between intervals")
      }
      assert(sorted.count(_._4 == 1) == 1, s"u=$u is_current count")
      assert(sorted.last._3.isEmpty, s"u=$u open interval must be last")
    }
  }

  test("partition invariance under shuffled input") {
    val base = collect(evs.toDF("event_id", "user_id", "ts", "event_type"))
    for (p <- Seq(1, 7, 32)) {
      val got = collect(
        evs.reverse.toDF("event_id", "user_id", "ts", "event_type")
          .repartition(p))
      assert(got == base, s"p=$p")
    }
  }
}
