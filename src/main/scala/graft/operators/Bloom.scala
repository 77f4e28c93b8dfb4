package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Bloom filter as a BIT-SET DataFrame (Bloom, CACM 1970) — the
  * membership member of the sketch suite ([[Sketch]] = frequency,
  * [[Hll]] = cardinality). `k` probe positions per value folded
  * into a `(bit)` frame of DISTINCT set positions: at most `mBits`
  * rows regardless of how many values stream through.
  *
  * Not a reference operator: part of the LLM-training-data surface
  * this engine adds (decontamination-style membership gates whose
  * ARTIFACT is persistable, mergeable, and — under the md5-prefix
  * key — replayable hash-identically in ANSI SQL, so the filter
  * itself is oracle-checked, not just bounded).
  *
  * Relationship to `Decontaminate.BenchSketch`: that is the
  * IN-MEMORY gate — a broadcast `BloomFilter` probed inside a scan,
  * zero joins, the right shape when one job builds and probes. This
  * is the STORED form of the same idea — a bit-position frame a
  * pipeline persists once, [[bloomMerge]]s as corpora append, and
  * any later job (or engine — it is plain parquet of Longs) probes
  * by equi-join. Set union is bit-set union, and `distinct` is
  * idempotent, so like [[Hll.hllMerge]] (and unlike CMS's SUM) the
  * merge identity survives OVERLAPPING inputs and at-least-once
  * replays.
  *
  * Scale shape:
  *  - [[bloomBits]] is scan → `k`-way `posexplode` → ONE distinct
  *    aggregate keyed by bit position. Partial aggregation reduces
  *    every task to ≤ `mBits` positions before the exchange — the
  *    value stream never crosses the wire.
  *  - [[mightContain]] probes are probe-set-sized: `probes × k`
  *    rows equi-joined against a broadcast of the ≤ `mBits`-row
  *    bit frame, then a per-value all-`k`-hit test. The build
  *    corpus is not touched.
  *  - One-sided like CMS: a present value hits all `k` bits ALWAYS
  *    (no false negatives — spec-pinned); a false positive needs
  *    all `k` positions collision-set, P ≈ (bitsSet/mBits)^k.
  *
  * Probe position `j` hashes `"j:value"` — the indexed-prefix seed
  * discipline shared with [[Sketch.bucketsOf]] and
  * `Dedup.minhashSignatures`.
  */
object Bloom {

  /** Normalized whitespace tokens, matching `CorpusStats`. */
  private def toks(text: Column): Column =
    split(Cleanser.normalized(text), " ")

  private def bitsOf(v: Column, mBits: Int, k: Int,
                     hashKey: Column => Column): Column =
    array((0 until k).map { j =>
      pmod(hashKey(concat(lit(s"$j:"), v)), lit(mBits.toLong))
    }: _*)

  /** The filter: distinct set bit positions of `k` probes per
    * value — ≤ `mBits` rows by construction, absent position ==
    * unset bit. */
  def bloomBits(df: DataFrame, value: Column, mBits: Int, k: Int,
                hashKey: Column => Column = xxhash64(_)): DataFrame = {
    require(mBits >= 2 && k >= 1, "need mBits >= 2 and k >= 1")
    df.where(value.isNotNull)
      .select(explode(bitsOf(value, mBits, k, hashKey)).as("bit"))
      .distinct()
  }

  /** Bit-set union of two filters (same mBits/k/hash family — the
    * caller's contract). Idempotent: overlapping builds and
    * replayed batches cannot change the result, so
    * `bloomMerge(bloom(A), bloom(B)) == bloom(A ∪ B)` always. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Probe a filter: `(v, might_contain)` for every distinct
    * non-null probe value — `might_contain` = 1 iff all `k` bit
    * positions are set. The filter side is broadcast (≤ `mBits`
    * rows); the probe side is whatever the caller asks about.
    * The bits frame is `distinct`-ed defensively before the join:
    * a caller who passes a raw union instead of [[bloomMerge]]
    * would otherwise inflate `count(__hit)` past `k` on duplicate
    * bit rows and flip `might_contain` to 0 — a FALSE NEGATIVE,
    * silently breaking the filter's one-sided contract. ≤ `mBits`
    * rows, so the dedup is frame-sized, spec-pinned. */
  def mightContain(bits: DataFrame, probes: DataFrame, value: Column,
                   mBits: Int, k: Int,
                   hashKey: Column => Column = xxhash64(_)): DataFrame =
    probes.select(value.as("v")).where(col("v").isNotNull).distinct()
      .select(col("v"), explode(bitsOf(col("v"), mBits, k, hashKey)).as("bit"))
      .join(broadcast(bits.select(col("bit")).distinct()
          .withColumn("__hit", lit(1))),
        Seq("bit"), "left")
      .groupBy(col("v"))
      .agg((count(col("__hit")) === k).cast("int").as("might_contain"))

  /** The decontamination-shaped end-to-end: build the filter from
    * `benchDf`'s tokens, probe it with `corpusDf`'s vocabulary, and
    * report `(tok, might_contain, actual)` — `actual` the exact
    * membership, carried so the surface itself EXHIBITS the
    * one-sided contract (`might_contain >= actual`, row for row:
    * false positives possible, false negatives never). */
  def tokenMembership(benchDf: DataFrame, corpusDf: DataFrame,
                      text: Column, mBits: Int, k: Int,
                      hashKey: Column => Column = xxhash64(_)): DataFrame = {
    val benchToks = benchDf.where(text.isNotNull)
      .select(explode(toks(text)).as("v")).distinct()
    val bits = bloomBits(benchToks, col("v"), mBits, k, hashKey)
    mightContain(bits, corpusDf.where(text.isNotNull)
        .select(explode(toks(text)).as("v")), col("v"), mBits, k, hashKey)
      .join(benchToks.select(col("v"), lit(1).as("__in")), Seq("v"), "left")
      .select(col("v").as("tok"), col("might_contain"),
        coalesce(col("__in"), lit(0)).as("actual"))
  }
}
