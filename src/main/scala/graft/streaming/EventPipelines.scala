package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.CensusPipeline

/** Structured Streaming twins of the batch pipeline (SURVEY.md
  * §2-streaming): the same transformations declared over an unbounded
  * source, so a census that runs hourly as a batch job can run
  * continuously with identical semantics.
  *
  * Scale notes: both twins are watermarked, so state is bounded —
  * the hourly aggregation keeps |event_type| × (watermark/1h) open
  * windows per key, and the dedup keeps one entry per key inside the
  * watermark horizon. State is partitioned by group key across
  * executors exactly like a batch shuffle; nothing accumulates on the
  * driver.
  */
// Serializable: a state-function lambda that calls a helper method
// on this object (tsMicros/microsTs) captures the MODULE as a lambda
// argument, and Spark's closure cleaner cannot null a SerializedLambda
// captured arg — the task then fails serialization. The module is
// stateless, so shipping it is free.
object EventPipelines extends Serializable {

  /** Streaming twin of `CensusPipeline.hourlyAgg` — same aggregate
    * expressions (shared `hourlyAggExprs`), tumbling 1-hour windows on
    * the event time, late data bounded by `watermark`. Output columns
    * match the batch twin: (event_type, hr, n, sum_value).
    */
  def streamHourlyCensus(events: DataFrame,
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(CensusPipeline.hourlyAggExprs.head,
        CensusPipeline.hourlyAggExprs.tail: _*)
      .select(col("event_type"), col("window.start").as("hr"),
        col("n"), col("sum_value"))

  /** Streaming twin of the unprocessed-file detection
    * (q_unprocessed_anti_join / file_cleanser.py:33-51): emit each key
    * once; duplicates arriving within the watermark horizon are
    * dropped, and state for keys older than the watermark is evicted.
    */
  def streamDedup(df: DataFrame, eventTimeCol: String, keys: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  // ---------------------------------------------------------------
  // Sessionization: custom per-key state via flatMapGroupsWithState
  // ---------------------------------------------------------------

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  // session edges in MICROS: `Timestamp.getTime` truncates to millis,
  // and the batch twin emits full-precision min/max timestamps — a
  // millis-grained state emitted sessions whose edges were up to
  // 999 µs early and broke stream == batch on the real (micros-
  // grained) events table. Caught by StreamBench's identity gate in
  // r13 (the spec's synthetic inputs were milli-aligned, so the spec
  // alone never saw it — its inputs now carry micros too). Same bug
  // family as the r12 streamAsofJoin millis-truncation find.
  // `schemaV` exists ONLY to change the state arity vs the retired
  // millis-grained shape: Spark's state-schema compatibility check
  // ignores FIELD NAMES, so a checkpoint written by the millis
  // version (same 4-Long/Double shape) would restart cleanly and be
  // silently reinterpreted 1000x off. One extra field makes the old
  // checkpoint fail the check loudly instead (advisor find, r14).
  final case class SessionState(startUs: Long, endUs: Long,
                                n: Long, sum: Double,
                                schemaV: Int = 2)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long,
                               sum_value: Double)

  /** Per-user session windows with an inactivity `gap`: events closer
    * than the gap chain into one session; a session emits once the
    * event-time watermark passes its end + gap (EventTimeTimeout).
    *
    * This is the `flatMapGroupsWithState` pattern for custom per-key
    * state: one small struct per *open* session per user, partitioned
    * across executors by the group key and evicted by timeout —
    * bounded regardless of stream length.
    *
    * Append-mode policies (documented, not hidden): events inside one
    * trigger batch are sorted and gap-split exactly; a *cross-batch*
    * out-of-order event merges into the open session when within the
    * gap of either session edge (extending `start` downward if
    * needed), else emits as its own standalone session — an already-
    * emitted session is never retracted, and a session gap-split
    * eagerly within a batch is not re-merged by later events. For
    * strictly watermark-correct late-data merging use
    * `sessionizeWindows` (the built-in `session_window`); this
    * operator is the shape for state logic the built-ins can't
    * express.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int,
                 watermark: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    val gapUs = gapMs * 1000L

    def toSession(uid: Long, s: SessionState): UserSession =
      UserSession(uid, microsTs(s.startUs), microsTs(s.endUs),
        s.n, s.sum)

    def fn(uid: Long, evts: Iterator[SessionEvent],
           state: GroupState[SessionState]): Iterator[UserSession] = {
      if (evts.isEmpty && state.hasTimedOut) {
        val out = state.getOption.map(toSession(uid, _))
        state.remove()
        return out.iterator
      }
      val sorted = evts.toArray.sortBy(e => tsMicros(e.ts))
      var open = state.getOption
      val closed = Vector.newBuilder[UserSession]
      sorted.foreach { e =>
        val t = tsMicros(e.ts)
        open match {
          case Some(s) if t >= s.startUs - gapUs && t <= s.endUs + gapUs =>
            // within gap of either edge: merge, extending both ways
            open = Some(SessionState(math.min(s.startUs, t),
              math.max(s.endUs, t), s.n + 1, s.sum + e.value))
          case Some(s) if t < s.startUs - gapUs =>
            // out-of-order beyond the gap: standalone historical session
            closed += UserSession(uid, e.ts, e.ts, 1L, e.value)
          case Some(s) =>
            closed += toSession(uid, s)
            open = Some(SessionState(t, t, 1L, e.value))
          case None =>
            open = Some(SessionState(t, t, 1L, e.value))
        }
      }
      open match {
        case Some(s) =>
          state.update(s)
          // timeout clock is millis-grained: round the horizon UP so
          // the timeout never fires a microsecond early
          state.setTimeoutTimestamp(
            Math.floorDiv(s.endUs + gapUs + 999L, 1000L))
        case None => state.remove()
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  // ---------------------------------------------------------------
  // Streaming token-budget admission (twin of takeByBudgetPerKey)
  // ---------------------------------------------------------------

  final case class BudgetDoc(key: String, order: Long, weight: Long)
  final case class BudgetSpent(spent: Long)
  final case class AdmittedDoc(key: String, order: Long, weight: Long,
                               cum_weight: Long)

  /** Streaming twin of `graft.etl.Batching.takeByBudgetPerKey`: admit
    * documents per key while the running weight (including the
    * current doc) stays ≤ `budget`.
    *
    * Semantics mirror the batch prefix-take: every arriving doc's
    * weight is added to the key's running total whether or not it is
    * admitted, so once a key's total passes the budget the key is
    * closed for good (weights are non-negative → the total is
    * monotone; state never retracts an admission). Docs inside one
    * trigger batch are processed in `order` order, matching the
    * batch operator's range sort; across batches admission is
    * necessarily arrival-ordered — a budget over an unbounded corpus
    * is an admission GATE, not a retroactive top-prefix.
    *
    * `NoTimeout` is deliberate: state is one long per key and must
    * outlive any watermark horizon (a budget does not expire); at
    * 100 TB the key domain (languages, domains) is dimension-sized,
    * so per-key state stays trivially bounded.
    */
  def streamTokenBudget(docs: Dataset[BudgetDoc],
                        budget: Long): Dataset[AdmittedDoc] = {
    require(budget >= 1, "budget must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(key: String, evts: Iterator[BudgetDoc],
           state: GroupState[BudgetSpent]): Iterator[AdmittedDoc] = {
      var spent = state.getOption.fold(0L)(_.spent)
      val out = Vector.newBuilder[AdmittedDoc]
      // precondition as the batch twin: weights non-negative (a
      // negative weight would make the total non-monotone and could
      // re-open a closed key)
      evts.toArray.sortBy(_.order).foreach { d =>
        spent += d.weight
        if (spent <= budget) out += AdmittedDoc(key, d.order, d.weight, spent)
      }
      state.update(BudgetSpent(spent))
      out.result().iterator
    }

    docs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  // ---------------------------------------------------------------
  // Streaming near-dup gate: in-stream state over LSH band buckets
  // ---------------------------------------------------------------

  final case class SigEvent(id: Long, ts: Timestamp, sig: Seq[Long])
  final case class BucketDoc(band: Int, bk: Long, id: Long, ts: Timestamp,
                             sig: Seq[Long])
  final case class SigEntry(id: Long, sig: Seq[Long])
  final case class BucketState(entries: List[SigEntry], lastMs: Long)
  final case class StreamPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** In-stream near-duplicate detection (r7) — dedup WITHIN the
    * stream, the piece the stream-static store join
    * (`Dedup.incrementalLshPairsFromIndex`) can't do: each arriving
    * document's MinHash signature is banded with the SAME
    * `Dedup.bandKeyArray` formula as the batch index, the stream is
    * keyed by (band, bk), and `flatMapGroupsWithState` holds the
    * signatures previously seen in each bucket. An arrival compares
    * against its bucket's held signatures (cross-batch AND
    * earlier-in-batch, in id order — exactly the batch generator's
    * vsRef ∪ vsNew families) and emits a [[StreamPair]] per agreeing
    * band at `est_jaccard` = agreeing positions / numHashes ≥
    * `threshold`, with `id_b` always the later arrival — the doc at
    * risk under the keep-first drop policy.
    *
    * Replay contract (spec-pinned): over any batch sequence with no
    * eviction, the emitted pair SET equals replaying
    * `Dedup.incrementalLshPairs(batch_k, batch_1..k-1)` for every k.
    * (Set, not bag: the batch generator dedups candidates across
    * bands before verifying; the stream, which never sees across
    * buckets, emits once per agreeing band instead.)
    *
    * Bounded state, two valves:
    *  - `EventTimeTimeout` eviction: a bucket idle past `evictAfter`
    *    of event time drops its state — history older than the
    *    horizon stops flagging (a streaming gate remembers a window,
    *    not forever; pair a long-horizon corpus against the STORED
    *    index path instead);
    *  - `maxBucketSize`: a bucket already holding that many
    *    signatures stops admitting (and comparing) — the hot-bucket
    *    valve, the streaming analog of the batch `maxBucketSize`
    *    exclusion (forward-only: already-held entries keep serving).
    * Per-bucket state is entries × ~numHashes longs, partitioned
    * across executors by bucket key like any shuffle.
    */
  def streamNearDupPairs(docs: Dataset[SigEvent], numHashes: Int,
                         bands: Int, threshold: Double,
                         watermark: String = "24 hours",
                         evictAfterMs: Long = 24L * 3600 * 1000,
                         maxBucketSize: Int = 1024): Dataset[StreamPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucketSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(key: (Int, Long), evts: Iterator[BucketDoc],
           state: GroupState[BucketState]): Iterator[StreamPair] = {
      if (!evts.hasNext && state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var entries = state.getOption.map(_.entries).getOrElse(Nil)
      var lastMs = state.getOption.fold(Long.MinValue)(_.lastMs)
      var nHeld = entries.size
      val out = Vector.newBuilder[StreamPair]
      // id order within the trigger batch = the batch generator's
      // id_a < id_b orientation for in-batch pairs
      evts.toArray.sortBy(_.id).foreach { d =>
        lastMs = math.max(lastMs, d.ts.getTime)
        if (nHeld < maxBucketSize) {
          entries.foreach { e =>
            if (e.id != d.id) {
              val sa = e.sig
              val sb = d.sig
              val n = math.min(sa.length, sb.length)
              var agree = 0
              var i = 0
              while (i < n) { if (sa(i) == sb(i)) agree += 1; i += 1 }
              val est = agree.toDouble / numHashes
              if (est >= threshold) out += StreamPair(e.id, d.id, est)
            }
          }
          entries = SigEntry(d.id, d.sig) :: entries
          nHeld += 1
        }
      }
      state.update(BucketState(entries, lastMs))
      state.setTimeoutTimestamp(lastMs + evictAfterMs)
      out.result().iterator
    }

    docs.toDF()
      .withWatermark("ts", watermark)
      .select(col("id"), col("ts"), col("sig"),
        explode(graft.operators.Dedup.bandKeyArray(col("sig"),
          numHashes, bands)).as("b"))
      .select(col("b.band").as("band"), col("b.bk").as("bk"),
        col("id"), col("ts"), col("sig"))
      .as[BucketDoc]
      .groupByKey(d => (d.band, d.bk))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  final case class DocEvent(id: Long, ts: Timestamp, text: String)
  final case class GramHit(id: Long, ts: Timestamp, pos: Int, h: Long,
                           rc: Long)
  final case class SpanSeen(lastMs: Long)
  final case class DocSpan(id: Long, span_start: Int, span_end: Int,
                           span_tokens: Int)

  /** Streaming ExactSubstr gate — the streaming twin of
    * `Dedup.perDocRepeatedSpans`: each arriving document's repeated
    * spans against the STORED gram-count frame (`Dedup.gramCounts`,
    * a stream-static join — the store is never re-shuffled) plus its
    * own internal repetition; batch-mates are invisible, so output
    * is invariant under micro-batch boundaries, the property that
    * makes the gate replayable (spec pins stream == perDoc batch).
    *
    * Shape: the per-row gram explode feeds ONE stream-static left
    * join; each doc's gram rows regroup by id and the span merge
    * runs in the group function (a document's rows always share its
    * micro-batch — the group is complete when it fires). State is
    * one timestamp per doc id inside the watermark horizon, used
    * only for timeout cleanup; nothing accumulates past it.
    * Caller contract: doc ids unique on the stream (as every batch
    * operator in the family). */
  def streamRepeatedSpans(docs: Dataset[DocEvent],
                          refGramCounts: DataFrame, minRun: Int,
                          hashKey: org.apache.spark.sql.Column =>
                            org.apache.spark.sql.Column = xxhash64(_),
                          watermark: String = "24 hours",
                          evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[DocSpan] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(id: Long, evts: Iterator[GramHit],
           state: GroupState[SpanSeen]): Iterator[DocSpan] = {
      if (!evts.hasNext && state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val rows = evts.toArray
      val lastMs = math.max(
        state.getOption.fold(Long.MinValue)(_.lastMs),
        rows.iterator.map(_.ts.getTime).max)
      val within = rows.groupBy(_.h).view.mapValues(_.length).toMap
      val anchors = rows.iterator
        .filter(r => within(r.h) + r.rc >= 2)
        .map(_.pos).toArray.sorted
      val out = Vector.newBuilder[DocSpan]
      var i = 0
      while (i < anchors.length) {
        var j = i
        while (j + 1 < anchors.length &&
          anchors(j + 1) <= anchors(j) + minRun) j += 1
        out += DocSpan(id, anchors(i), anchors(j) + minRun - 1,
          anchors(j) + minRun - 1 - anchors(i) + 1)
        i = j + 1
      }
      state.update(SpanSeen(lastMs))
      state.setTimeoutTimestamp(lastMs + evictAfterMs)
      out.result().iterator
    }

    val let = (bound: org.apache.spark.sql.Column,
               body: org.apache.spark.sql.Column =>
                 org.apache.spark.sql.Column) =>
      element_at(transform(array(bound), body), 1)
    docs.toDF()
      .withWatermark("ts", watermark)
      .where(size(split(graft.io.Cleanser.normalized(col("text")),
        " ")) >= minRun)
      .select(col("id"), col("ts"), posexplode(
        let(split(graft.io.Cleanser.normalized(col("text")), " "),
          t => transform(sequence(lit(0), size(t) - minRun),
            i => hashKey(array_join(slice(t, i + 1, lit(minRun)),
              " ")))))
        .as(Seq("pos", "h")))
      .join(refGramCounts.select(col("h"),
        col("c").as("__rc")), Seq("h"), "left")
      .select(col("id"), col("ts"), col("pos"), col("h"),
        coalesce(col("__rc"), lit(0L)).as("rc"))
      .as[GramHit]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  final case class DocSoftWeight(id: Long, n_grams: Long, n_dup: Long,
                                 dup_mass: Long, dup_ratio: Double,
                                 weight: Double)

  /** Streaming twin of `Dedup.perDocSoftDedupWeights` — each arriving
    * document's soft-dedup statistics against the STORED gram-count
    * frame plus its own internal repetition (batch-mates invisible,
    * so the emitted weight for a doc id is identical no matter how
    * the stream is micro-batched — the same invariance contract as
    * [[streamRepeatedSpans]], and the batch twin is spec-pinned
    * equal). Same shape too: one stream-static left join (the store
    * is never re-shuffled), per-doc regroup, stats in the group
    * function with the batch operator's exact IEEE arithmetic
    * (integer sums, one division, one multiply/add/divide chain).
    * State is one timestamp per doc id for timeout cleanup only. */
  def streamSoftDedupWeights(docs: Dataset[DocEvent],
                             refGramCounts: DataFrame, minRun: Int,
                             lambda: Double = 4.0,
                             hashKey: org.apache.spark.sql.Column =>
                               org.apache.spark.sql.Column = xxhash64(_),
                             watermark: String = "24 hours",
                             evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[DocSoftWeight] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(id: Long, evts: Iterator[GramHit],
           state: GroupState[SpanSeen]): Iterator[DocSoftWeight] = {
      if (!evts.hasNext && state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val rows = evts.toArray
      val lastMs = math.max(
        state.getOption.fold(Long.MinValue)(_.lastMs),
        rows.iterator.map(_.ts.getTime).max)
      val within = rows.groupBy(_.h).view.mapValues(_.length.toLong).toMap
      var n = 0L; var nd = 0L; var mass = 0L
      rows.foreach { r =>
        val tot = within(r.h) + r.rc
        n += 1L
        if (tot >= 2L) { nd += 1L; mass += tot }
      }
      val ratio = nd.toDouble / n.toDouble
      state.update(SpanSeen(lastMs))
      state.setTimeoutTimestamp(lastMs + evictAfterMs)
      Iterator.single(DocSoftWeight(id, n, nd, mass, ratio,
        1.0 / (1.0 + lambda * ratio)))
    }

    val let = (bound: org.apache.spark.sql.Column,
               body: org.apache.spark.sql.Column =>
                 org.apache.spark.sql.Column) =>
      element_at(transform(array(bound), body), 1)
    docs.toDF()
      .withWatermark("ts", watermark)
      .where(size(split(graft.io.Cleanser.normalized(col("text")),
        " ")) >= minRun)
      .select(col("id"), col("ts"), posexplode(
        let(split(graft.io.Cleanser.normalized(col("text")), " "),
          t => transform(sequence(lit(0), size(t) - minRun),
            i => hashKey(array_join(slice(t, i + 1, lit(minRun)),
              " ")))))
        .as(Seq("pos", "h")))
      .join(refGramCounts.select(col("h"),
        col("c").as("__rc")), Seq("h"), "left")
      .select(col("id"), col("ts"), col("pos"), col("h"),
        coalesce(col("__rc"), lit(0L)).as("rc"))
      .as[GramHit]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Watermark-correct built-in sessionization (`session_window`):
    * late in-watermark events merge/extend sessions properly and
    * results emit only once final. Note the built-in's `end` is
    * last-event + gap (the window edge), not the last event time.
    */
  def sessionizeWindows(events: DataFrame, gapMinutes: Int,
                        watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Batch twin of `sessionize` for backfills and the equivalence
    * spec: the gap-break cumulative-sum sessionization (lag → break
    * flag → running session index → group). Window partitions are
    * per-user — thousands of small partitions at scale, not a global
    * sort. Gap compares in milliseconds (`unix_millis`), exactly like
    * the streaming twin — a seconds cast would split/merge differently
    * on sub-second boundaries. */
  /** Streaming Count-Min sketch — `Sketch.countMinCells` declared
    * over an unbounded document stream as a plain running aggregate
    * (`outputMode("complete")`/`"update"`). No watermark and no
    * custom state function on purpose: the aggregation state is the
    * sketch itself, ≤ `depth·width` `(j, bucket) → cnt` cells BY
    * CONSTRUCTION — the one unwatermarked streaming aggregate in
    * this file whose state cannot grow with the stream. Because
    * cells are occurrence counts (`cmsMerge` == one-shot on the
    * union, spec-pinned in SketchSpec), the complete-mode output
    * after any micro-batch split equals the batch sketch over the
    * documents seen so far — re-batching-invariant the way
    * `streamRepeatedSpans` is, but via the SUM identity instead of
    * per-doc state (StreamingSpec pins stream == batch across an
    * arbitrary split). */
  def streamCmsCells(docs: DataFrame,
                     text: org.apache.spark.sql.Column,
                     depth: Int = 4, width: Int = 8192,
                     hashKey: org.apache.spark.sql.Column =>
                       org.apache.spark.sql.Column = xxhash64(_)): DataFrame =
    graft.operators.Sketch.countMinCells(docs, text, depth, width, hashKey)

  /** Streaming HyperLogLog — `Hll.tokenRegisters` declared over an
    * unbounded doc stream as a running `max` aggregate. Like
    * [[streamCmsCells]], unwatermarked on purpose: state is the
    * register grid, ≤ `m` rows by construction. `max` is idempotent
    * as well as commutative, so the stream == batch identity holds
    * even when micro-batches REPLAY overlapping documents (at-least-
    * once sources double-counting a doc corrupts a CMS cell but
    * cannot move an HLL register — StreamingSpec pins exactly this
    * contrast). */
  def streamHllRegisters(docs: DataFrame,
                         text: org.apache.spark.sql.Column,
                         m: Int = 4096,
                         hashKey: org.apache.spark.sql.Column =>
                           org.apache.spark.sql.Column = xxhash64(_)): DataFrame =
    graft.operators.Hll.tokenRegisters(docs, text, m, hashKey)

  /** Streaming log-linear quantile histogram —
    * `Hdr.tokenLengthFrame` declared over an unbounded doc stream as
    * a running count aggregate. Like [[streamCmsCells]],
    * unwatermarked on purpose: state is the histogram, ≤
    * `(64−b)·2^(b+1)` buckets BY CONSTRUCTION. Bucket counts SUM
    * under disjoint union (`Hdr.merge`), so the complete-mode output
    * after any micro-batch split equals the batch frame over the
    * documents seen so far (StreamingSpec pins stream == batch
    * across an arbitrary split) — and `Hdr.quantiles` reads p50/p99
    * off the sink table at any moment without touching the stream. */
  def streamHdrFrame(docs: DataFrame,
                     text: org.apache.spark.sql.Column,
                     b: Int = graft.operators.Hdr.DefaultBits): DataFrame =
    graft.operators.Hdr.tokenLengthFrame(docs, text, b)

  /** Streaming hourly OHLC bars — `TimeSeries.downsampleOhlc`
    * re-expressed as a windowed streaming aggregate: `min_by`/
    * `max_by` over the `(ts, tie)` struct give the deterministic
    * open/close the batch operator's `row_number` windows give
    * (declarative aggregates, so they run in streaming where
    * `row_number` cannot). Null values are excluded up front — the
    * one semantic narrowing vs batch, whose open/close are
    * POSITIONAL and can surface a null value; on null-free values
    * stream == batch bar-for-bar (StreamingSpec). Watermark the ts
    * column and run append mode in production (bars seal when the
    * watermark passes the window); the spec uses complete mode to
    * read bars mid-stream. */
  def streamOhlcHourly(events: DataFrame, keys: Seq[String],
                       tsName: String, value: org.apache.spark.sql.Column,
                       tie: org.apache.spark.sql.Column): DataFrame = {
    val ord = struct(col(tsName), tie)
    events.where(value.isNotNull)
      .groupBy((window(col(tsName), "1 hour") +: keys.map(col)): _*)
      .agg(
        min_by(value, ord).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, ord).as("close"),
        count(lit(1)).as("n_events"),
        sum(value.cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select((keys.map(col) :+ col("window.start").as("bucket") :+
        col("open") :+ col("high") :+ col("low") :+ col("close") :+
        col("n_events") :+ col("sum_value")): _*)
  }

  final case class FunnelEvent(user_id: Long, ts: Timestamp,
                               event_type: String)
  // stage times in MICROS (tsMicros): the batch operator compares
  // full-precision timestamps, and a millis-grained state let a
  // stage event up to 999 µs EARLIER than the previous stage's
  // minimum pass the inclusive `>=` gate (and milli-tied sorting
  // could pick a micros-later event as "first"), diverging from
  // batch on micros-grained tables — the sessionize/streamAsofJoin
  // truncation family. Field renamed with the unit (a checkpoint
  // started on the millis version must restart from a fresh
  // checkpoint directory — same Long shape, different meaning).
  // `schemaV`: arity-bump guard against millis-era checkpoints, as
  // SessionState — the state compatibility check ignores field
  // names, so only a shape change fails the restart loudly.
  final case class FunnelState(timesUs: List[Long], schemaV: Int = 2)
  final case class FunnelProgress(user_id: Long, stages_completed: Long)

  /** Streaming twin of `EventAnalytics.funnelDepth`: per-user funnel
    * progression as `flatMapGroupsWithState` — state is the
    * completed stage-time prefix (≤ k longs per user, bounded by
    * construction), and a `(user, depth)` row is emitted each time
    * the depth GROWS (append mode: progress rows are monotone and
    * never retracted; the max per user is the batch depth,
    * spec-pinned).
    *
    * Delivery contract (documented, as `sessionize`'s policies):
    * per-user IN-ORDER delivery across micro-batches — under it the
    * first eligible stage event the stream meets IS the batch
    * operator's grouped minimum, which is exactly why stream ==
    * batch (StreamingSpec). Within one batch events are sorted by
    * `(ts, stage index)`, so same-timestamp progression (the q147
    * inclusive boundary) resolves identically to batch; an
    * out-of-order event ACROSS batches that would have advanced an
    * earlier stage is ignored, never retro-fitted. */
  def streamFunnelDepth(events: Dataset[FunnelEvent],
                        stages: Seq[String]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap

    def fn(uid: Long, evts: Iterator[FunnelEvent],
           state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
      var times = state.getOption.map(_.timesUs).getOrElse(Nil)
      val sorted = evts.toArray
        .filter(e => stageIdx.contains(e.event_type))
        .sortBy(e => (tsMicros(e.ts), stageIdx(e.event_type)))
      val out = Vector.newBuilder[FunnelProgress]
      sorted.foreach { e =>
        val k = times.size
        if (k < stages.size && e.event_type == stages(k) &&
            (k == 0 || tsMicros(e.ts) >= times.last)) {
          times = times :+ tsMicros(e.ts)
          out += FunnelProgress(uid, times.size.toLong)
        }
      }
      if (times.nonEmpty) state.update(FunnelState(times))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stream-static as-of enrichment: an unbounded fact stream joined
    * against a STATIC SCD2 interval dimension (`etl.Scd.buildType2`
    * output) on key equality + interval containment
    * (`valid_from <= ts` and `ts < valid_to`-or-open). Type-2
    * intervals TILE each key's history, so every fact matches at
    * most one interval — a STATELESS stream-static left join: no
    * watermark, no state store, nothing to grow; the dimension
    * re-reads per micro-batch (broadcast-sized dims stay broadcast).
    * This is the streaming half of the as-of story: the batch
    * theorem `AsofJoin.asof(facts, changes) == facts ⋈ containment
    * buildType2(changes)` on the tracked attributes is spec-pinned
    * in AsofJoinSpec, and StreamingSpec pins stream == batch under
    * an arbitrary micro-batch split. Facts before a key's first
    * change get null attributes, exactly as the as-of. */
  def streamAsofScd2(facts: DataFrame, dim: DataFrame,
                     keys: Seq[String], tsName: String,
                     attrs: Seq[String]): DataFrame = {
    val f = facts.alias("__f")
    val d = dim.alias("__d")
    val cond = keys.map(k => col(s"__f.$k") === col(s"__d.$k"))
      .reduce(_ && _) &&
      col(s"__f.$tsName") >= col("__d.valid_from") &&
      (col("__d.valid_to").isNull ||
        col(s"__f.$tsName") < col("__d.valid_to"))
    f.join(d, cond, "left")
      .select(facts.columns.map(c => col(s"__f.$c")).toSeq ++
        attrs.map(a => col(s"__d.$a")): _*)
  }

  final case class AsofLeftEvent(key: Long, ts: Timestamp, left_id: Long)
  final case class AsofRightEvent(key: Long, ts: Timestamp, right_id: Long,
                                  right_value: Double)
  final case class AsofUnion(key: Long, ts: Timestamp, side: Int, id: Long,
                             value: Option[Double])
  // rightValue is Option so a matched right row's NULL payload
  // stays null in the output, as the batch struct does (folding it
  // to 0.0 would be a silent wrong value, spec-pinned).
  // STATE SCHEMA NOTE: this is state-schema v2 (v1 carried a
  // non-nullable Double and no seenMs) — a checkpointed query
  // started on v1 cannot restart against this class (Spark's state
  // store schema check rejects it); restart such a query from a new
  // checkpoint directory, replaying the source per its delivery
  // contract. Future field changes here carry the same cost —
  // widen deliberately.
  final case class AsofLast(ts: Timestamp, rightId: Long,
                            rightValue: Option[Double], seenMs: Long)

  /** Full-precision event-time in micros: `getTime` alone truncates
    * to millis, and the batch operator compares full-precision
    * timestamps — sub-millisecond order must survive (the events
    * table is micros-grained). */
  private[graft] def tsMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** Inverse of [[tsMicros]]: a full-precision Timestamp from epoch
    * micros (constructor millis + setNanos for the sub-second part —
    * `new Timestamp(us / 1000)` alone drops the microseconds). */
  private[graft] def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  final case class AsofOut(key: Long, left_id: Long, ts: Timestamp,
                           asof_right_id: Option[Long],
                           asof_ts: Option[Timestamp],
                           asof_right_value: Option[Double])

  /** Stream-STREAM as-of join — the event-time join form
    * [[streamAsofScd2]] (stream-static) can't cover: both sides
    * unbounded (trades/quotes, events/clicks), each left row matched
    * to the LATEST right row of its key with `rightTs <= leftTs`,
    * optionally within `toleranceMs`.
    *
    * The batch operator's union-tag discipline carried into state:
    * both sides tag into ONE keyed stream (right `side` 0 < left 1,
    * so a right row exactly at `leftTs` matches — the inclusive
    * boundary, as batch), and `flatMapGroupsWithState` holds per key
    * ONLY the latest right struct `(ts, id, value)` — NOT a buffer
    * of right history: the running `last` needs one value, which is
    * what bounds state at one small struct per key (the key domain
    * is the same one any keyed aggregation already holds state for).
    * Within a trigger batch events sort by `(ts, side, id)` — the
    * batch operator's exact sort key, so same-timestamp resolution
    * (right-before-left, max-id right wins ties) is identical; the
    * held struct only ever advances by that ordering, so a right
    * row REPLAYED by an at-least-once source cannot move it
    * backwards (idempotent, the HLL-max property).
    *
    * Delivery contract (documented, as [[streamFunnelDepth]]):
    * per-key event-time-ordered delivery ACROSS sides — under it the
    * held struct at each left row IS the batch running `last`, so
    * stream == `AsofJoin.asof` exactly (StreamingSpec pins this
    * under arbitrary micro-batch splits of the time-ordered stream).
    * A cross-batch out-of-order right row (arriving AFTER a left row
    * it should have matched) folds into state for FUTURE left rows
    * but never retracts the emitted match — append-mode monotonicity,
    * the same never-retract policy as `sessionize`. Null timestamps
    * follow batch: a null-ts right row is dropped, a null-ts left
    * row emits unmatched.
    *
    * State bound, two regimes: with `evictAfterMs = None` (default)
    * the struct lives forever — right for DIMENSION-sized key
    * domains (instruments, devices), the same state class any keyed
    * aggregation holds. For an UNBOUNDED key domain (user churn),
    * pass `evictAfterMs`: the operator watermarks the stream and
    * drops a key's struct once the event-time watermark passes
    * `evictAfterMs` past the key's latest event (either side keeps
    * it warm) — after eviction a left row matches nothing until a
    * fresh right arrives, the [[streamNearDupPairs]] horizon
    * contract (a streaming join remembers a window, not forever;
    * spec-pinned: pre-horizon identity to batch, post-eviction
    * null). */
  def streamAsofTagged(tagged: Dataset[AsofUnion],
                       toleranceMs: Option[Long] = None,
                       watermark: String = "24 hours",
                       evictAfterMs: Option[Long] = None): Dataset[AsofOut] = {
    val spark = tagged.sparkSession
    import spark.implicits._

    def fn(key: Long, evts: Iterator[AsofUnion],
           state: GroupState[AsofLast]): Iterator[AsofOut] = {
      if (!evts.hasNext && state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var last = state.getOption
      var seenMs = last.fold(Long.MinValue)(_.seenMs)
      val out = Vector.newBuilder[AsofOut]
      val sorted = evts.toArray.sortBy(e =>
        (if (e.ts == null) Long.MinValue else tsMicros(e.ts), e.side, e.id))
      sorted.foreach { e =>
        if (e.ts != null) seenMs = math.max(seenMs, e.ts.getTime)
        if (e.side == 0) {
          if (e.ts != null) {
            val t = tsMicros(e.ts)
            val better = last.forall(s => tsMicros(s.ts) < t ||
              (tsMicros(s.ts) == t && s.rightId < e.id))
            if (better)
              last = Some(AsofLast(e.ts, e.id, e.value, seenMs))
          }
        } else {
          val m = if (e.ts == null) None else last.filter(s =>
            toleranceMs.forall(tol =>
              tsMicros(s.ts) >= tsMicros(e.ts) - tol * 1000L))
          out += AsofOut(key, e.id, e.ts, m.map(_.rightId),
            m.map(_.ts), m.flatMap(_.rightValue))
        }
      }
      last.map(_.copy(seenMs = seenMs)) match {
        case Some(s) =>
          state.update(s)
          // clamp to the current watermark: a key touched below the
          // watermark (a stale right re-arming after other keys
          // advanced it) would otherwise set a timeout BELOW the
          // watermark. Spark 4.1 accepts that call (verified: the
          // spec's repro passes unclamped — it just fires at the
          // next trigger), but earlier Spark versions rejected it
          // with a query-killing IllegalArgumentException; the clamp
          // makes the eviction instant explicit and version-proof
          evictAfterMs.foreach(ev => state.setTimeoutTimestamp(
            math.max(s.seenMs + ev, state.getCurrentWatermarkMs() + 1)))
        case None => ()
      }
      out.result().iterator
    }

    evictAfterMs match {
      case Some(_) =>
        tagged.toDF().withWatermark("ts", watermark).as[AsofUnion]
          .groupByKey(_.key)
          .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.EventTimeTimeout)(fn)
      case None =>
        tagged.groupByKey(_.key)
          .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.NoTimeout)(fn)
    }
  }

  /** [[streamAsofTagged]] over two typed streams: tags and unions
    * them (the batch operator's exact construction), then joins. */
  def streamAsofJoin(left: Dataset[AsofLeftEvent],
                     right: Dataset[AsofRightEvent],
                     toleranceMs: Option[Long] = None): Dataset[AsofOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.toDF().select(col("key"), col("ts"), lit(1).as("side"),
      col("left_id").as("id"), lit(null).cast("double").as("value"))
    val r = right.toDF().select(col("key"), col("ts"), lit(0).as("side"),
      col("right_id").as("id"), col("right_value").as("value"))
    streamAsofTagged(l.unionByName(r).as[AsofUnion], toleranceMs)
  }

  /** Streaming twin of the q166 session rollup: the per-user
    * aggregate over the CLOSED sessions [[sessionize]] emits —
    * stateful-op composition (flatMapGroupsWithState → streaming
    * aggregation), the chain a session-analytics deployment actually
    * runs. State is the rollup itself: one totals row per user
    * (count/sum/max + the exact BIGINT duration sum), the same
    * bounded class as any keyed aggregation; emitted values follow
    * the batch operator's fixed double chain `(Σms / n) / 1000`, so
    * once every session is sealed the last update per user equals
    * `sessionizeBatch(...).groupBy(user)` exactly (StreamingSpec
    * pins it through a foreachBatch-style final snapshot). Run in
    * update mode: each sealed session re-emits its user's row.
    *
    * Deployment note: Spark's global-watermark correctness check
    * rejects any stateful operator downstream of
    * `flatMapGroupsWithState` because the sealed sessions carry
    * event times older than the watermark — "late" to a WINDOWED
    * downstream aggregate. This rollup is a TOTAL aggregate: no
    * watermark, no window, no late-row dropping — every sealed
    * session folds in whenever it arrives, so the conservative
    * check is a false positive HERE and the chain needs
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled
    * = false` (exactly what the spec does, scoped). Do NOT disable
    * it for a windowed/watermarked aggregate over session columns —
    * there the dropped-late-row risk is real. */
  def streamSessionStats(sessions: Dataset[UserSession]): DataFrame =
    sessions.toDF()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_session_events"),
        (sum(unix_millis(col("session_end")) -
            unix_millis(col("session_start"))).cast("double") /
          count(lit(1)).cast("double") / lit(1000.0))
          .as("mean_session_sec"))

  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events.select(col("user_id"), col("ts"), col("value"))
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("__prev")) >
            gapMinutes * 60000L, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .drop("__sid")
  }
}
