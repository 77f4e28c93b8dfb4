package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
  * Meunier, AofA 2007) over corpus values — cardinality questions
  * ("how many distinct tokens / urls / shingles, per domain")
  * answered from a fixed `m`-register artifact instead of a
  * value-sized distinct shuffle.
  *
  * Not a reference operator: part of the LLM-training-data surface
  * this engine adds beyond the reference's ETL scope. Complements
  * `q_vocab_stats_approx`'s built-in `approx_count_distinct`
  * (HLL++) with what the built-in cannot give: the REGISTERS as a
  * first-class DataFrame artifact — persistable, mergeable
  * ([[hllMerge]] == one-shot on the union, register-for-register),
  * group-keyed, and under the md5-prefix key replayable
  * hash-identically in ANSI SQL, so the sketch itself is
  * oracle-checked, not just error-bounded.
  *
  * Scale shape (the [[Sketch]] discipline):
  *  - [[hllRegisters]] is scan → hash → `(group, bucket)`-keyed
  *    `max(rho)`. Partial aggregation reduces every task to at most
  *    `m` registers per group BEFORE the exchange — the value
  *    stream never crosses the wire, and there is no `distinct`
  *    pre-shuffle (duplicates land on the same register and `max`
  *    absorbs them).
  *  - `max` is idempotent and commutative, so the sketch is
  *    re-batching-invariant by construction: appending a day's
  *    batch to a stored register frame is [[hllMerge]] of an
  *    `m`-row frame, and a Structured-Streaming sketch is a plain
  *    unwatermarked running `max` aggregate with provably bounded
  *    state (`streamHllRegisters`).
  *  - [[hllEstimate]] folds registers group-locally: `m` rows in,
  *    one row out per group. The corpus is not touched.
  *
  * Hash-bit layout (`m` a power of two, `b = log2 m`): register
  * index = the low `b` bits; `w` = the remaining high bits
  * (`shiftrightunsigned`, disjoint from the index); `rho(w)` =
  * trailing-zero count of `w` plus 1 — geometric with
  * `P(rho = k) = 2^-k`, computed as string arithmetic on `bin(w)`
  * (`length - length(rtrim(_, "0")) + 1`) because Spark's `bin`
  * and DuckDB's `bin` print the identical no-leading-zeros binary
  * form, making the register grid engine-portable under the 60-bit
  * md5 prefix. `w == 0` and anything past [[RhoCap]] clamp to
  * [[RhoCap]] — the clamp keeps the scaled harmonic sum inside a
  * Long (`m·2^RhoCap < 2^63` for m ≤ 4096) and costs
  * `P(rho > 50) = 2^-50` per value, never observable under the
  * seeded key (its `w` has 48 bits, so rho ≤ 49; spec-asserted).
  *
  * Estimator: the scaled harmonic sum
  * `s_scaled = Σ_j 2^(RhoCap − M_j)` (empty register: `M_j = 0`)
  * is EXACT Long arithmetic — order-free, overflow-free by the
  * clamp — and the raw HLL estimate
  * `E = alpha_m · m² · 2^RhoCap / s_scaled` is a single
  * multiply/divide chain on doubles (no pow, no ln), so both
  * replay bit-identically in SQL and the estimate surface stays
  * oracle-green (the `q_sample_priority` division-only
  * discipline). The small-range linear-counting correction
  * (`m·ln(m/V)`) needs `ln` — by the repo's exactness rule it is
  * left to the consumer (the surface exposes `v_empty` precisely
  * so a caller can apply it); the raw estimate's 1.04/√m relative
  * error is spec-pinned against planted cardinalities.
  */
object Hll {

  /** Clamp on rho: keeps `m · 2^RhoCap` inside a Long for m ≤ 4096
    * and is unreachable under the 60-bit seeded key (rho ≤ 49). */
  val RhoCap = 50

  /** Normalized whitespace tokens, matching `CorpusStats`. */
  private def toks(text: Column): Column =
    split(Cleanser.normalized(text), " ")

  private def requirePow2(m: Int): Int = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** `rho(w)` = trailing zeros of `w` + 1, clamped to [[RhoCap]];
    * `w == 0` (all scanned bits zero) is the clamp by definition. */
  private def rhoOf(w: Column): Column =
    when(w === 0L, lit(RhoCap)).otherwise(
      least(length(bin(w)) - length(rtrim(bin(w), "0")) + lit(1), lit(RhoCap)))

  /** The sketch: `(group..., bucket, rho)` — at most `m` registers
    * per group regardless of how many values stream through. Only
    * touched registers appear (absent register == empty, `M_j` 0).
    * No pre-`distinct`: duplicate values hit the same register and
    * `max` absorbs them map-side. */
  def hllRegisters(df: DataFrame, value: Column, m: Int = 4096,
                   hashKey: Column => Column = xxhash64(_),
                   groupBy: Seq[Column] = Nil): DataFrame = {
    val b = requirePow2(m)
    val h = hashKey(value)
    df.where(value.isNotNull)
      .select((groupBy.zipWithIndex.map { case (g, i) => g.as(s"_$i") }
        :+ h.bitwiseAND(lit(m - 1L)).as("bucket")
        :+ rhoOf(shiftrightunsigned(h, b)).as("rho")): _*)
      .groupBy(col("bucket") +: groupBy.indices.map(i => col(s"_$i")): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Register-wise max of two sketches (same m/hash family — the
    * caller's contract, as `Sketch.cmsMerge`). Because `max` is
    * idempotent and commutative, `hllMerge(hll(A), hll(B)) ==
    * hll(A ∪ B)` register-for-register even when A and B overlap —
    * the append/streaming identity, stronger than CMS's (which
    * needs disjoint streams). */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "rho").toSeq
    a.unionByName(b).groupBy(keys.map(col): _*).agg(max(col("rho")).as("rho"))
  }

  /** Fold a register frame into `(group..., m, v_empty, s_scaled,
    * est)`: `v_empty` = untouched registers, `s_scaled` the exact
    * Long harmonic sum `Σ 2^(RhoCap − M_j)`, `est` the raw HLL
    * estimate `alpha_m · m² · 2^RhoCap / s_scaled` (double
    * multiply/divide chain only — engine-portable). */
  def hllEstimate(registers: DataFrame, m: Int,
                  groupCols: Seq[String] = Nil): DataFrame = {
    requirePow2(m)
    // alpha_m per Flajolet et al. §4: the closed-form constant is the
    // published approximation for m >= 128; m in {16,32,64} take the
    // exact tabulated values (using the large-m formula there biases
    // the raw estimate with no warning). Expressions kept as literal
    // op chains so SQL replays fold to the identical double.
    val alpha = m match {
      case 16 => lit(0.673)
      case 32 => lit(0.697)
      case 64 => lit(0.709)
      case _  => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    }
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).as("touched"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - rho)"))
          .as("s_touched"))
      .select((groupCols.map(col) :+ lit(m.toLong).as("m")
        :+ (lit(m.toLong) - col("touched")).as("v_empty")
        :+ (col("s_touched") +
             (lit(m.toLong) - col("touched")) * lit(1L << RhoCap))
            .as("s_scaled")): _*)
      .withColumn("est",
        alpha * lit(m.toDouble) * lit(m.toDouble) *
          lit((1L << RhoCap).toDouble) / col("s_scaled").cast("double"))
  }

  /** End-to-end: distinct-token estimate of a document corpus,
    * optionally per group column (e.g. per source — group-keyed
    * sketches, the per-domain-vocabulary question at 100 TB). */
  def distinctTokens(df: DataFrame, text: Column, m: Int = 4096,
                     hashKey: Column => Column = xxhash64(_),
                     groupCols: Seq[String] = Nil): DataFrame = {
    val exploded = df.where(text.isNotNull)
      .select((groupCols.map(col) :+ explode(toks(text)).as("tok")): _*)
    val regs = hllRegisters(exploded, col("tok"), m, hashKey,
      groupCols.map(col))
    val named = groupCols.zipWithIndex.foldLeft(regs) {
      case (r, (c, i)) => r.withColumnRenamed(s"_$i", c)
    }
    hllEstimate(named, m, groupCols)
  }

  /** The register grid of [[distinctTokens]] — the persistable /
    * mergeable / oracle-checkable artifact itself. */
  def tokenRegisters(df: DataFrame, text: Column, m: Int = 4096,
                     hashKey: Column => Column = xxhash64(_)): DataFrame =
    hllRegisters(
      df.where(text.isNotNull).select(explode(toks(text)).as("tok")),
      col("tok"), m, hashKey)
}
