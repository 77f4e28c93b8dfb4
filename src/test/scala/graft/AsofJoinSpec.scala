package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Backward as-of join contracts: straight-line brute-force parity
  * on adversarial data (equal-timestamp collisions, right rows with
  * null payload values, keys with no rights, keys with no lefts),
  * the inclusive boundary (a right row exactly AT the left ts
  * matches), the max-tieBreak resolution of equal-(key, ts) rights,
  * the tolerance gate at the exact boundary, same-row payload
  * integrity through the struct (matched id and value always come
  * from one right row), and partition invariance. */
class AsofJoinSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Straight-line reference: per left row, scan all rights. */
  private def brute(ls: Seq[(Long, Long, Timestamp)],
                    rs: Seq[(Long, Long, Timestamp, java.lang.Double)],
                    tolMillis: Option[Long])
      : Map[Long, Option[(Long, java.lang.Double)]] =
    ls.map { case (id, u, t) =>
      val cands = rs.filter { case (_, ru, rt, _) =>
        ru == u && !rt.after(t) &&
          tolMillis.forall(m => rt.getTime >= t.getTime - m)
      }
      val best =
        if (cands.isEmpty) None
        else Some(cands.maxBy { case (rid, _, rt, _) => (rt.getTime, rid) })
      id -> best.map { case (rid, _, _, v) => (rid, v) }
    }.toMap

  // equal-ts collisions on purpose: u1 has two clicks AND a purchase
  // all at 10:00; u2's only click has a NULL value; u3 has no clicks;
  // u4 has clicks but no purchases
  private val lefts = Seq(
    (100L, 1L, ts("2026-01-01 10:00:00")),
    (101L, 1L, ts("2026-01-01 09:59:59.999999")),
    (102L, 1L, ts("2026-01-01 12:00:00")),
    (103L, 2L, ts("2026-01-01 10:30:00")),
    (104L, 3L, ts("2026-01-01 10:00:00")))
  private val rights = Seq(
    (200L, 1L, ts("2026-01-01 10:00:00"), java.lang.Double.valueOf(1.5)),
    (201L, 1L, ts("2026-01-01 10:00:00"), java.lang.Double.valueOf(2.5)),
    (202L, 1L, ts("2026-01-01 08:00:00"), java.lang.Double.valueOf(3.5)),
    (203L, 2L, ts("2026-01-01 10:00:00"), null: java.lang.Double),
    (204L, 4L, ts("2026-01-01 10:00:00"), java.lang.Double.valueOf(9.9)))

  private def run(tol: Option[String]) =
    AsofJoin.asof(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("click_id", "user_id", "ts", "click_value"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id",
        tolerance = tol.map(expr))
      .select("event_id", "asof_click_id", "asof_click_value")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1),
           if (r.isNullAt(2)) null: java.lang.Double
           else java.lang.Double.valueOf(r.getDouble(2))))))
      .toMap

  test("brute-force parity, unbounded lookback") {
    val got = run(None)
    val want = brute(lefts, rights, None)
    assert(got == want)
    // the specific contracts, pinned explicitly on top of parity:
    // inclusive boundary + max-tie: purchase 100 at 10:00 matches
    // click 201 (not 200) — equal ts matches, max click_id wins
    assert(got(100L).contains((201L, java.lang.Double.valueOf(2.5))))
    // strictly-before left misses the 10:00 clicks, falls to 08:00
    assert(got(101L).contains((202L, java.lang.Double.valueOf(3.5))))
    // a matched right row with NULL payload value is still the match
    // (struct packing: the id arrives, the null value stays null)
    assert(got(103L).contains((203L, null: java.lang.Double)))
    // no rights for the key -> null match
    assert(got(104L).isEmpty)
  }

  test("tolerance gates the latest match at the exact boundary") {
    val got = run(Some("INTERVAL 1 HOUR"))
    assert(got == brute(lefts, rights, Some(3600L * 1000)))
    // 102 at 12:00: latest click is 10:00, outside 1h -> null, even
    // though an unbounded as-of would match it
    assert(got(102L).isEmpty)
    // 100 at 10:00: click AT 10:00 is exactly tol-0 inside -> match
    assert(got(100L).contains((201L, java.lang.Double.valueOf(2.5))))
    // boundary exactly at leftTs - tol matches (>=, not >)
    val exact = AsofJoin.asof(
        Seq((1L, 9L, ts("2026-01-01 11:00:00"))).toDF("event_id", "user_id", "ts"),
        Seq((2L, 9L, ts("2026-01-01 10:00:00"), 1.0)).toDF("click_id", "user_id", "ts", "click_value"),
        Seq("user_id"), "ts", "ts", Seq("click_id"), "click_id",
        Some(expr("INTERVAL 1 HOUR")))
      .select("asof_click_id").as[Option[Long]].collect()
    assert(exact.toSeq == Seq(Some(2L)))
  }

  test("partition invariance and determinism under shuffled input order") {
    val base = run(None)
    for (p <- Seq(1, 7, 32)) {
      val got = AsofJoin.asof(
          lefts.reverse.toDF("event_id", "user_id", "ts").repartition(p),
          rights.reverse.toDF("click_id", "user_id", "ts", "click_value")
            .repartition(p),
          Seq("user_id"), "ts", "ts", Seq("click_id", "click_value"),
          "click_id")
        .select("event_id", "asof_click_id", "asof_click_value")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None
           else Some((r.getLong(1),
             if (r.isNullAt(2)) null: java.lang.Double
             else java.lang.Double.valueOf(r.getDouble(2))))))
        .toMap
      assert(got == base, s"p=$p")
    }
  }

  test("randomized brute-force parity (dense ts collisions)") {
    // 40 lefts x 60 rights over 5 users and only 8 distinct
    // timestamps — collisions everywhere; deterministic seed
    val rnd = new scala.util.Random(42)
    val stamps = (0 until 8).map(h => ts(f"2026-02-01 0$h:00:00"))
    val ls = (0 until 40).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, stamps(rnd.nextInt(8))))
    val rs = (0 until 60).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, stamps(rnd.nextInt(8)),
        if (rnd.nextBoolean()) java.lang.Double.valueOf(rnd.nextInt(100))
        else null: java.lang.Double))
    val got = AsofJoin.asof(
        ls.toDF("event_id", "user_id", "ts"),
        rs.toDF("click_id", "user_id", "ts", "click_value"),
        Seq("user_id"), "ts", "ts", Seq("click_id", "click_value"),
        "click_id")
      .select("event_id", "asof_click_id", "asof_click_value")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1),
           if (r.isNullAt(2)) null: java.lang.Double
           else java.lang.Double.valueOf(r.getDouble(2))))))
      .toMap
    assert(got == brute(ls, rs, None))
  }

  /** Micros-precise straight-line reference for all three
    * directions (the backward [[brute]] predates directions and
    * compares at millis; these tests include sub-milli stamps). */
  private def bruteDir(ls: Seq[(Long, Long, Timestamp)],
                       rs: Seq[(Long, Long, Timestamp, java.lang.Double)],
                       dir: String, tolMicros: Option[Long])
      : Map[Long, Option[(Long, java.lang.Double)]] = {
    def us(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    ls.map { case (id, u, t) =>
      val tu = us(t)
      def back = rs.filter { case (_, ru, rt, _) => ru == u &&
        us(rt) <= tu && tolMicros.forall(m => us(rt) >= tu - m) }
        .sortBy { case (rid, _, rt, _) => (us(rt), rid) }.lastOption
      def fwd = rs.filter { case (_, ru, rt, _) => ru == u &&
        us(rt) >= tu && tolMicros.forall(m => us(rt) <= tu + m) }
        .sortBy { case (rid, _, rt, _) => (-us(rt), rid) }.lastOption
      val best = dir match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (tu - us(b._3) <= us(f._3) - tu) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      id -> best.map { case (rid, _, _, v) => (rid, v) }
    }.toMap
  }

  private def runDir(ls: Seq[(Long, Long, Timestamp)],
                     rs: Seq[(Long, Long, Timestamp, java.lang.Double)],
                     dir: String, tol: Option[String]) =
    AsofJoin.asof(
        ls.toDF("event_id", "user_id", "ts"),
        rs.toDF("click_id", "user_id", "ts", "click_value"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        payload = Seq("click_id", "click_value"), tieBreak = "click_id",
        tolerance = tol.map(expr), direction = dir)
      .select("event_id", "asof_click_id", "asof_click_value")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1),
           if (r.isNullAt(2)) null: java.lang.Double
           else java.lang.Double.valueOf(r.getDouble(2))))))
      .toMap

  test("forward direction: inclusive boundary, max tie, tolerance lookahead") {
    val got = runDir(lefts, rights, "forward", None)
    assert(got == bruteDir(lefts, rights, "forward", None))
    // inclusive: purchase 100 at 10:00 matches the equal-ts clicks,
    // max click_id 201 wins the tie
    assert(got(100L).contains((201L, java.lang.Double.valueOf(2.5))))
    // 101 at 09:59:59.999999 (1 µs earlier): the 10:00 clicks are the
    // EARLIEST at-or-after — micros-grained, not milli-rounded
    assert(got(101L).contains((201L, java.lang.Double.valueOf(2.5))))
    // 102 at 12:00 has no later click -> null
    assert(got(102L).isEmpty)
    // tolerance gates the lookahead: 1 µs within a 1-second window
    // matches, outside does not
    val gotTol = runDir(lefts, rights, "forward", Some("INTERVAL 1 SECOND"))
    assert(gotTol == bruteDir(lefts, rights, "forward", Some(1000000L)))
    assert(gotTol(101L).contains((201L, java.lang.Double.valueOf(2.5))))
  }

  test("nearest direction: closest wins, exact tie resolves backward") {
    val ls = Seq(
      (1L, 9L, ts("2026-01-01 10:00:10")), // equidistant: backward wins
      (2L, 9L, ts("2026-01-01 10:00:14")), // forward is closer
      (3L, 9L, ts("2026-01-01 10:00:06")), // backward is closer
      (4L, 9L, ts("2026-01-01 10:00:00")), // exact hit: d=0, backward
      (5L, 8L, ts("2026-01-01 10:00:00"))) // no rights for the key
    val rs = Seq(
      (20L, 9L, ts("2026-01-01 10:00:00"), java.lang.Double.valueOf(1.0)),
      (21L, 9L, ts("2026-01-01 10:00:20"), java.lang.Double.valueOf(2.0)))
    val got = runDir(ls, rs, "nearest", None)
    assert(got == bruteDir(ls, rs, "nearest", None))
    assert(got(1L).contains((20L, java.lang.Double.valueOf(1.0))))
    assert(got(2L).contains((21L, java.lang.Double.valueOf(2.0))))
    assert(got(3L).contains((20L, java.lang.Double.valueOf(1.0))))
    assert(got(4L).contains((20L, java.lang.Double.valueOf(1.0))))
    assert(got(5L).isEmpty)
    // tolerance is a |distance| gate: 5 s keeps only the <=5 s side
    val gotTol = runDir(ls, rs, "nearest", Some("INTERVAL 5 SECOND"))
    assert(gotTol == bruteDir(ls, rs, "nearest", Some(5000000L)))
    assert(gotTol(1L).isEmpty) // both sides 10 s away -> gated
    assert(gotTol(3L).isEmpty) // backward 6 s, forward 14 s -> gated
    assert(gotTol(4L).contains((20L, java.lang.Double.valueOf(1.0))))
  }

  test("randomized three-direction parity (dense collisions, micros stamps)") {
    val rnd = new scala.util.Random(77)
    // sub-millisecond offsets planted on both sides
    val stamps = (0 until 8).map(h => ts(f"2026-02-01 0$h:00:00")) ++
      Seq(ts("2026-02-01 03:00:00.0005"), ts("2026-02-01 03:00:00.000501"))
    val ls = (0 until 40).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, stamps(rnd.nextInt(stamps.size))))
    val rs = (0 until 60).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, stamps(rnd.nextInt(stamps.size)),
        if (rnd.nextBoolean()) java.lang.Double.valueOf(rnd.nextInt(100))
        else null: java.lang.Double))
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some("INTERVAL 1 HOUR"))) {
      val tolUs = tol.map(_ => 3600L * 1000000L)
      assert(runDir(ls, rs, dir, tol) == bruteDir(ls, rs, dir, tolUs),
        s"direction=$dir tol=$tol")
    }
  }

  test("forward/nearest: null-ts lefts match nothing, null-ts rights dropped") {
    val ls = Seq((1L, 9L, null: Timestamp),
      (2L, 9L, ts("2026-01-01 10:00:00")))
    val rs = Seq(
      (20L, 9L, null: Timestamp, java.lang.Double.valueOf(7.0)),
      (21L, 9L, ts("2026-01-01 11:00:00"), java.lang.Double.valueOf(1.0)))
    for (dir <- Seq("forward", "nearest")) {
      val got = runDir(ls, rs, dir, None)
      assert(got(1L).isEmpty, s"null-ts left must not match ($dir)")
      assert(got(2L).contains((21L, java.lang.Double.valueOf(1.0))))
    }
  }

  test("the SCD2 theorem: as-of against the change stream == containment join against buildType2 intervals") {
    // the same randomized dense-collision corpus shape as above;
    // tracked ATTRIBUTES must agree (the as-of may surface a
    // compressed-away row's id, but its state is identical)
    val rnd = new scala.util.Random(11)
    val types = Seq("a", "b", "c")
    val stamps = (0 until 6).map(h => ts(f"2026-04-01 0$h:00:00"))
    val changes = (0 until 120).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, stamps(rnd.nextInt(6)),
        types(rnd.nextInt(3))))
    val facts = (0 until 60).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, stamps(rnd.nextInt(6))))
    val factsDf = facts.toDF("event_id", "user_id", "ts")
    val changesDf = changes.toDF("click_id", "user_id", "ts", "event_type")
    val viaAsof = AsofJoin.asof(factsDf, changesDf, Seq("user_id"),
        "ts", "ts", Seq("event_type"), "click_id")
      .select("event_id", "asof_event_type")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val intervals = graft.etl.Scd.buildType2(changesDf, Seq("user_id"),
      col("ts"), col("click_id"), Seq("event_type"))
    val viaScd = graft.streaming.EventPipelines.streamAsofScd2(
        factsDf, intervals, Seq("user_id"), "ts", Seq("event_type"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(viaScd == viaAsof)
  }

  test("null timestamps: null-ts rights are dropped, null-ts lefts match nothing") {
    // u1's only rights have a NULL ts — without the filter Spark's
    // nulls-first sort would make one of them the running-last match
    // for event 300, which has no true preceding right
    val l = Seq(
      (300L, 1L, ts("2026-01-01 10:00:00")),
      (301L, 2L, ts("2026-01-01 10:00:00")),
      (302L, 2L, null: Timestamp)).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (400L, 1L, null: Timestamp, java.lang.Double.valueOf(6.6)),
      (401L, 2L, null: Timestamp, java.lang.Double.valueOf(7.7)),
      (402L, 2L, ts("2026-01-01 09:00:00"), java.lang.Double.valueOf(8.8)))
      .toDF("click_id", "user_id", "ts", "click_value")
    val got = AsofJoin.asof(l, r, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_value"), "click_id")
      .select("event_id", "asof_click_id", "asof_click_value")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None
         else Some((row.getLong(1), row.getDouble(2))))).toMap
    assert(got == Map(
      300L -> None,                     // no real right for u1
      301L -> Some((402L, 8.8)),        // 401's null ts never wins
      302L -> None),                    // null-ts left row kept, unmatched
      s"got $got")
  }

  test("asofSalted == asof: any slice count, single hot key, tolerance, hand boundaries") {
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1),
           if (r.isNullAt(2)) null: java.lang.Double
           else java.lang.Double.valueOf(r.getDouble(2))))))
      .toMap
    def salted(ls: Seq[(Long, Long, Timestamp)],
               rs: Seq[(Long, Long, Timestamp, java.lang.Double)],
               tol: Option[String], sl: Int,
               bounds: Option[Seq[Long]] = None) =
      canon(AsofJoin.asofSalted(
          ls.toDF("event_id", "user_id", "ts"),
          rs.toDF("click_id", "user_id", "ts", "click_value"),
          Seq("user_id"), "ts", "ts", Seq("click_id", "click_value"),
          "click_id", tol.map(expr), slices = sl, boundaries = bounds)
        .select("event_id", "asof_click_id", "asof_click_value")
        .collect())
    // hand corpus (equal-ts collisions, null payload, keys missing
    // either side): every slice count reproduces the plain as-of
    val base = run(None)
    for (sl <- Seq(1, 3, 32))
      assert(salted(lefts, rights, None, sl) == base, s"slices=$sl")
    // tolerance gate through the salt
    assert(salted(lefts, rights, Some("INTERVAL 1 HOUR"), 4) ==
      run(Some("INTERVAL 1 HOUR")))
    // the pathological case the salt exists for: ONE key owns the
    // whole stream, dense ts collisions — brute-force parity
    val rnd = new scala.util.Random(7)
    val stamps = (0 until 8).map(h => ts(f"2026-03-01 0$h:00:00"))
    val ls = (0 until 60).map(i => (i.toLong, 1L, stamps(rnd.nextInt(8))))
    val rs = (0 until 80).map(i => (1000L + i, 1L, stamps(rnd.nextInt(8)),
      java.lang.Double.valueOf(rnd.nextInt(100))))
    val want = brute(ls, rs, None)
    for (sl <- Seq(1, 5, 16))
      assert(salted(ls, rs, None, sl) == want, s"hot slices=$sl")
    // caller-given boundaries, including one ON an event timestamp
    // (equal stamps share a slice by construction) and one past the
    // data: still exact
    val onStamp = stamps(3).getTime * 1000L
    assert(salted(ls, rs, None, 4,
      Some(Seq(onStamp, onStamp + 7200L * 1000000L,
        stamps(7).getTime * 1000L + 1L))) == want)
    // null timestamps keep the batch contract through the salt
    val lsN = ls :+ ((999L, 1L, null: Timestamp))
    val rsN = rs :+ ((2000L, 1L, null: Timestamp,
      java.lang.Double.valueOf(5.0)))
    val gotN = salted(lsN, rsN, None, 5)
    assert(gotN(999L).isEmpty, "null-ts left must stay unmatched")
    assert(gotN.filter(_._1 != 999L) == want,
      "null-ts right must be invisible")
  }

  test("reserved column names are rejected") {
    val l = Seq((1L, 1L, ts("2026-01-01 00:00:00"))).toDF("event_id", "__side", "ts")
    val r = Seq((1L, 1L, ts("2026-01-01 00:00:00"))).toDF("click_id", "__side", "ts")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, Seq("__side"), "ts", "ts", Seq("click_id"), "click_id")
    }
  }
}
