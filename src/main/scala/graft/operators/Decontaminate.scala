package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: per-training-document n-gram overlap
  * against a held-out benchmark corpus — the standard pre-training
  * hygiene pass (report the fraction of a doc's shingles that appear
  * anywhere in the benchmark; drop or flag docs above a threshold).
  *
  * Not a reference operator: part of the LLM-training-data surface
  * this engine adds beyond the reference's ETL scope.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the TRAIN side is one scan → shingle explode → distinct — the
  *    same inverted-index pass `Dedup.jaccardPairs` does, map-side
  *    until the distinct;
  *  - the BENCH side is small *by construction* (benchmarks are
  *    MB-scale against a 100 TB corpus), so its distinct shingle set
  *    is `broadcast()` — the candidate match is a broadcast hash
  *    join, never a shuffle of the training corpus by shingle;
  *  - the per-doc rollup shuffles one (id, hit) row per distinct
  *    train shingle with map-side partial counts — the only shuffle
  *    in the plan, keyed by doc id.
  *
  * Shingles travel as 64-bit hashes (`plans.HashedShingles`, the
  * same fused codegen loop and the same argument as
  * `Dedup.jaccardPairs`): 8-byte join/distinct keys instead of
  * n-token strings (~14× less shuffle on tag-heavy corpora), and a
  * cross-corpus collision (~|train|·|bench|/2⁶⁴ — vanishing,
  * deterministic per corpus, so the oracle gate stays exact) only
  * *adds* a false match — for decontamination that errs toward
  * dropping more, the safe direction.
  */
object Decontaminate {

  /** Per-doc DISTINCT hashed-shingle array `(id, shingles:
    * array<long>)`. The dedup is per-row `array_distinct` — map-side,
    * no shuffle — rather than a global `(id, shingle)` distinct,
    * which is the same set (shingles are deduped within each doc;
    * across docs they were never merged). Shared by the batch rollup
    * (which explodes it) and the streaming twin (which keeps the
    * array — a stateless per-row shape). */
  private[graft] def hashedShingleArr(df: DataFrame, id: Column,
                                      text: Column, n: Int): DataFrame =
    df.select(id.as("id"),
        split(graft.io.Cleanser.normalized(text), " ").as("__w"))
      .where(size(col("__w")) >= n)
      .select(col("id"),
        array_distinct(
          graft.plans.HashExpressions.hashedShingles(col("__w"), n))
          .as("shingles"))

  /** Distinct hashed-shingle frame `(id, shingle: long)` — the
    * jaccardPairs index shape. */
  private def hashedShingleSet(df: DataFrame, id: Column, text: Column,
                               n: Int): DataFrame =
    hashedShingleArr(df, id, text, n)
      .select(col("id"), explode(col("shingles")).as("shingle"))

  /** The benchmark's global distinct shingle set folded into a ONE-ROW
    * frame `(bench_shingles: array<long>)` — the broadcastable scalar
    * the streaming twin joins against (bench corpora are MB-scale by
    * construction; the array is sorted for determinism). */
  private[graft] def benchShingleArray(bench: DataFrame, id: Column,
                                       text: Column, n: Int): DataFrame =
    hashedShingleSet(bench, id, text, n)
      .select(col("shingle")).distinct()
      .agg(sort_array(collect_list(col("shingle"))).as("__bench"))

  /** Per-train-doc overlap stats: `(id, n_shingles, n_matched,
    * overlap_frac, contaminated)`. Docs with fewer than `n` tokens
    * have no shingles and are absent from the output (consistent
    * with `Dedup.shingles`). `overlap_frac` is an exact IEEE division
    * of two counts; `contaminated` = overlap_frac >= threshold as
    * 0/1 int.
    */
  def overlapStats(train: DataFrame, bench: DataFrame,
                   id: Column, text: Column, n: Int,
                   threshold: Double): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    val benchSet = hashedShingleSet(bench, id, text, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    hashedShingleSet(train, id, text, n)
      .join(broadcast(benchSet), Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }

  /** A prebuilt, already-broadcast bench sketch: the pipeline-owned
    * lifetime for the Bloom gates. Build it ONCE per bench corpus
    * ([[buildBenchSketch]] — one count job when `expectedItems` isn't
    * passed, one distributed build aggregate, one broadcast), then
    * gate every batch against it for free: the sketch-taking
    * [[overlapStatsBloom]]/[[overlapStatsBloomStateless]] overloads
    * spend ZERO bench-side jobs per call. The per-call-building
    * convenience forms remain for one-shot use and delegate here.
    * `n` rides along so a caller can't probe with a different shingle
    * width than the sketch was built from. */
  final case class BenchSketch(bc: Broadcast[BloomFilter], n: Int)

  /** Build the bench shingle sketch once: distinct hashed `n`-gram
    * shingles → distributed Bloom aggregate → broadcast. Pass the
    * known bench distinct-shingle count as `expectedItems` to skip
    * the sizing count job. */
  def buildBenchSketch(bench: DataFrame, id: Column, text: Column,
                       n: Int, fpp: Double = 0.01,
                       expectedItems: Long = 0L): BenchSketch = {
    require(n >= 1, "shingle size must be >= 1")
    val benchSet = hashedShingleSet(bench, id, text, n)
      .select(col("shingle")).distinct()
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(benchSet.count(), 1L)
    val filter = graft.plans.BloomFilters.buildLong(
      benchSet, col("shingle"), items, fpp)
    BenchSketch(bench.sparkSession.sparkContext.broadcast(filter), n)
  }

  /** [[overlapStatsBloom]] against a prebuilt [[BenchSketch]] — the
    * per-batch shape: no bench scan, no count, no build, no new
    * broadcast; just the train-side scan → probe → rollup. */
  def overlapStatsBloom(train: DataFrame, sketch: BenchSketch,
                        id: Column, text: Column,
                        threshold: Double): DataFrame = {
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    hashedShingleSet(train, id, text, sketch.n)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(graft.plans.BloomFilters.mightContainLong(sketch.bc,
          col("shingle")), 1)).as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }

  /** [[overlapStatsBloomStateless]] against a prebuilt
    * [[BenchSketch]]: a pure projection — the form a per-batch or
    * streaming caller should hold between invocations. */
  def overlapStatsBloomStateless(docs: DataFrame, sketch: BenchSketch,
                                 id: Column, text: Column,
                                 threshold: Double): DataFrame = {
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    hashedShingleArr(docs, id, text, sketch.n)
      .select(col("id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        graft.plans.BloomFilters.countContainedLong(sketch.bc,
          col("shingles")).as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }

  /** Sketch variant of [[overlapStats]] for when even the bench
    * shingle set outgrows an exact broadcast (a 10⁹-shingle composite
    * benchmark suite is ~8 GB as exact 64-bit keys — past broadcast
    * comfort; its Bloom sketch at 1% fpp is ~1.2 GB, at 5% ~750 MB,
    * and the fpp knob trades memory directly against over-dropping).
    * The plan gets STRICTLY simpler: no join at all — the train side
    * is one scan → shingle explode → per-row sketch probe (codegen) →
    * the same doc-keyed rollup, with the sketch built by one
    * distributed aggregate over the bench side and broadcast once.
    *
    * Error direction: a Bloom false positive inflates `n_matched`, so
    * `contaminated` can only move 0→1 — decontamination drops MORE,
    * never less, the safe side (spec-asserted superset of the exact
    * gate). `n_shingles` and the doc row set are exactly
    * [[overlapStats]]'s.
    *
    * `expectedItems` sizes the sketch; pass the known bench distinct
    * count, or <= 0 to spend one (bench-side, cheap) count job.
    *
    * Lifetime contract: each call of THIS one-shot form builds (one
    * Spark job, plus a count job when `expectedItems` isn't passed)
    * and broadcasts one fresh sketch; the broadcast lives until the
    * session GCs it (ContextCleaner). Long-lived pipelines gating
    * batch after batch against the SAME bench corpus should
    * [[buildBenchSketch]] once and call the [[BenchSketch]] overload —
    * the pit of success the r6 verdict asked for (spec-counted: zero
    * bench-side jobs per repeated gate).
    */
  def overlapStatsBloom(train: DataFrame, bench: DataFrame,
                        id: Column, text: Column, n: Int,
                        threshold: Double, fpp: Double = 0.01,
                        expectedItems: Long = 0L): DataFrame =
    overlapStatsBloom(train,
      buildBenchSketch(bench, id, text, n, fpp, expectedItems),
      id, text, threshold)

  /** Stateless per-row form of [[overlapStatsBloom]]: the sketch is
    * built once from the (static, MB-scale) bench corpus, then each
    * doc's overlap is a single projection — `size(shingles)` probes of
    * the broadcast filter via the codegen'd `BloomCountContainedLong`,
    * no explode, no rollup shuffle, no join. Because nothing
    * aggregates, the SAME declaration runs on a STREAMING `docs` frame
    * in Append mode — the streaming decontamination gate at sketch
    * memory cost (`overlapStatsStateless` is its exact-set sibling;
    * this one trades its O(|bench|) per-row `array_intersect` hash
    * build for O(|doc|) probes — cheaper per row AND smaller per
    * executor once the bench set is large). Same conservative
    * fp direction as [[overlapStatsBloom]] — and the same one-shot
    * lifetime: per-batch/streaming callers should hold a
    * [[BenchSketch]] and use that overload instead.
    */
  def overlapStatsBloomStateless(docs: DataFrame, bench: DataFrame,
                                 id: Column, text: Column, n: Int,
                                 threshold: Double, fpp: Double = 0.01,
                                 expectedItems: Long = 0L): DataFrame =
    overlapStatsBloomStateless(docs,
      buildBenchSketch(bench, id, text, n, fpp, expectedItems),
      id, text, threshold)

  /** Stateless per-row variant of [[overlapStats]] — identical output
    * (spec-asserted), but each doc's overlap is computed in one row
    * against the broadcast bench-shingle ARRAY (`array_intersect`)
    * instead of explode → join → rollup. No doc-keyed shuffle at all,
    * and — because no state, no aggregation, no watermark is involved
    * — the SAME declaration runs unchanged on a STREAMING `docs`
    * frame (stream-static equi-join on a constant key, Append mode):
    * the streaming decontamination gate is this function applied to
    * `readStream` input.
    *
    * Cost shape vs the join path: `array_intersect` builds a hash set
    * from one argument per ROW, so per-doc cost is
    * O(|bench| + |doc|); the join path pays O(|bench|) once per
    * PARTITION (broadcast hash table) plus a corpus-wide shuffle.
    * Batch pipelines over huge corpora with large bench sets keep
    * [[overlapStats]]; streams and shuffle-averse pipelines take this
    * one (bench sets are MB-scale by construction).
    */
  def overlapStatsStateless(docs: DataFrame, bench: DataFrame,
                            id: Column, text: Column, n: Int,
                            threshold: Double): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    val benchArr = broadcast(
      benchShingleArray(bench, id, text, n).withColumn("__one", lit(1)))
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    hashedShingleArr(docs, id, text, n)
      .withColumn("__one", lit(1))
      .join(benchArr, "__one")
      .select(col("id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        size(array_intersect(col("shingles"), col("__bench")))
          .cast("long").as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }

  /** [[overlapStats]] through a [[Bloom]] BIT-SET FRAME instead of
    * an exact join or an in-memory `BloomFilter` — the STORED-gate
    * decontamination path: build (or load) the bench shingle bit
    * frame once, then every batch's overlap is probe-join-rollup
    * against a broadcast of the ≤ `mBits`-row frame. Same surface
    * as [[overlapStats]] `(id, n_shingles, n_matched, overlap_frac,
    * contaminated)`; conservative in the same direction as the
    * Bloom overloads (`n_matched` ≥ exact, so contamination is
    * never under-detected — spec-pinned ⊇ plus equality at
    * collision-free `mBits`), but unlike them the GATE ITSELF is an
    * engine-portable parquet artifact: under the md5-prefix key the
    * whole path — bits, probes, per-doc rollup — replays
    * hash-identically in SQL (the oracle-green q140), which no
    * broadcast-`BloomFilter` form can offer. Probes are computed
    * once per DISTINCT train shingle (vocabulary-sized), then
    * joined back to the per-doc shingle frame. */
  def overlapStatsBloomFrame(train: DataFrame, bench: DataFrame,
                             id: Column, text: Column, n: Int,
                             threshold: Double, mBits: Int, k: Int,
                             hashKey: Column => Column = xxhash64(_))
      : DataFrame = {
    val bits = Bloom.bloomBits(
      Dedup.shingles(bench, id, text, n).select(col("shingle")),
      col("shingle"), mBits, k, hashKey)
    val trainSh = Dedup.shingles(train, id, text, n)
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    trainSh
      .join(Bloom.mightContain(bits, trainSh, col("shingle"), mBits, k,
          hashKey).withColumnRenamed("v", "shingle"),
        Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("might_contain")).cast("long").as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }
}
