package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * over the corpus token stream, plus the heavy-hitter probe built
  * on it — frequency estimation whose ARTIFACT is a fixed `depth ×
  * width` grid of Long counters instead of a vocabulary-sized exact
  * table.
  *
  * Not a reference operator: part of the LLM-training-data surface
  * this engine adds beyond the reference's ETL scope (corpus-scale
  * token/n-gram frequency questions — boilerplate discovery,
  * contamination probes, df-style weighting — answered from a
  * sketch small enough to broadcast).
  *
  * Scale shape — the whole point of the sketch:
  *  - [[countMinCells]] is scan → explode tokens → `posexplode` of
  *    the `depth` bucket hashes → ONE `(j, bucket)`-keyed count.
  *    Partial aggregation reduces every task's tokens into at most
  *    `depth·width` cells BEFORE the exchange, so the shuffle is
  *    bounded by `depth·width·numPartitions` rows REGARDLESS of
  *    corpus size — at 100 TB the token stream never crosses the
  *    wire, only per-task sketch grids do. (Contrast the exact
  *    frequency table, whose shuffle is vocabulary-sized per task
  *    and whose result grows with the corpus.)
  *  - Cells are plain occurrence counts, so they SUM under corpus
  *    union: `cms(A ∪ B)` == [[cmsMerge]] of the two sketches,
  *    cell-for-cell (spec-pinned). Appending a day's batch to a
  *    persisted sketch is a sketch-sized aggregate of the BATCH
  *    alone — the incremental-family discipline, for free, and the
  *    same identity makes a Structured-Streaming sketch a plain
  *    running aggregate.
  *  - [[cmsEstimates]] probes are vocabulary-sized (or
  *    benchmark-sized, for decontamination-style "how often does
  *    this n-gram occur" questions): `probes × depth` rows
  *    equi-joined against a broadcast of the ≤ `depth·width`-row
  *    sketch, then a `min` per token. The corpus is not touched.
  *  - The final top-k ranking windows over the PROBE set —
  *    vocabulary-bound, never corpus-bound (same bound as
  *    `CorpusStats.docFrequencies`' result).
  *
  * Estimate semantics: `est(t) = min_j cells(j, h_j(t) mod width)`
  * — a one-sided estimator, `est ≥ true count` ALWAYS (collisions
  * only add), with `est − true ≤ e·N/width` at confidence
  * `1 − e^−depth` (the classic CMS bound; spec-pinned as the
  * always-≥ side plus exactness when `width` dwarfs the
  * vocabulary).
  *
  * Two hash families, as the dedup/quality operators: xxhash64
  * (the scale path, rows-only at the query surface) and the 60-bit
  * md5 prefix ([[QualityModel.seededKey]]), under which the ENTIRE
  * sketch — cells, probe joins, min, ranking — replays
  * hash-identically in DuckDB, so both the sketch artifact and the
  * heavy-hitter surface are oracle-green, not just bounded.
  * Depth row `j` hashes `"j:token"` — one hash family indexed by a
  * prefix, the seed discipline `Dedup.minhashSignatures` uses.
  */
object Sketch {

  /** Normalized whitespace tokens, matching `CorpusStats`. */
  private def toks(text: Column): Column =
    split(Cleanser.normalized(text), " ")

  /** The `depth` bucket hashes of one token, position = depth row:
    * `bucket_j = pmod(hash("j:" + tok), width)`. */
  private def bucketsOf(tok: Column, depth: Int, width: Int,
                        hashKey: Column => Column): Column =
    array((0 until depth).map { j =>
      pmod(hashKey(concat(lit(s"$j:"), tok)), lit(width.toLong))
    }: _*)

  /** The sketch: `(j, bucket, cnt)` — occurrence counts of the
    * corpus token stream folded into `depth` hash rows of `width`
    * buckets. Only touched cells appear (absent cell == 0); at most
    * `depth·width` rows regardless of corpus size. */
  def countMinCells(df: DataFrame, text: Column,
                    depth: Int = 4, width: Int = 8192,
                    hashKey: Column => Column = xxhash64(_)): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    df.where(text.isNotNull)
      .select(explode(toks(text)).as("tok"))
      .select(posexplode(bucketsOf(col("tok"), depth, width, hashKey))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of two sketches (same depth/width/hash family —
    * the caller's contract, as with `Dedup` gram stores). Because
    * cells are plain counts, `cmsMerge(cms(A), cms(B)) ==
    * cms(A ∪ B)` exactly — the append/streaming identity. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query a sketch: `(tok, est)` for every distinct probe
    * token, `est = min_j coalesce(cnt, 0)`. The sketch side is
    * broadcast (≤ `depth·width` rows by construction); the probe
    * side is whatever the caller asks about — never the corpus. */
  def cmsEstimates(cells: DataFrame, probes: DataFrame, tok: Column,
                   depth: Int = 4, width: Int = 8192,
                   hashKey: Column => Column = xxhash64(_)): DataFrame =
    probes.select(tok.as("tok")).where(col("tok").isNotNull).distinct()
      .select(col("tok"),
        posexplode(bucketsOf(col("tok"), depth, width, hashKey))
          .as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Sketch-estimated top-k tokens `(rnk, tok, est)`: build the
    * sketch over `df`, probe it with `df`'s own vocabulary, rank by
    * `(est desc, tok)`. The ranking window is probe-set-sized
    * (vocabulary-bound), not corpus-bound. One-sided estimates mean
    * a true heavy hitter can never rank below a same-count peer by
    * MISSING mass — only collision inflation reorders, bounded by
    * the CMS guarantee. */
  def cmsHeavyHitters(df: DataFrame, text: Column, k: Int,
                      depth: Int = 4, width: Int = 8192,
                      hashKey: Column => Column = xxhash64(_)): DataFrame = {
    val corpus = df.where(text.isNotNull)
    val cells = countMinCells(corpus, text, depth, width, hashKey)
    val probes = corpus.select(explode(toks(text)).as("tok"))
    // filter on the raw int rank, cast AFTER: the `rn <= k` shape is
    // what InferWindowGroupLimit pattern-matches to put a map-side
    // group limit under the (vocabulary-bound) ranking sort
    cmsEstimates(cells, probes, col("tok"), depth, width, hashKey)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("est").desc, col("tok"))))
      .where(col("rn") <= k)
      .select(col("rn").cast("long").as("rnk"), col("tok"), col("est"))
  }

  /** The exact twin: true top-k token frequencies `(rnk, tok, cnt)`
    * with the same `(count desc, tok)` ranking — the oracle-green
    * surface [[cmsHeavyHitters]]' spec measures against. Exact and
    * vocabulary-shuffling: the plan the sketch exists to avoid at
    * corpus scale, and the right tool when the vocabulary is known
    * small. */
  def heavyHittersExact(df: DataFrame, text: Column, k: Int): DataFrame =
    df.where(text.isNotNull)
      .select(explode(toks(text)).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      .where(col("rn") <= k)
      .select(col("rn").cast("long").as("rnk"), col("tok"), col("cnt"))
}
