package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: per-stratum rates
  * (domain/source/language weighting — the "data mixture" knob of a
  * pretraining corpus) decided by a *content hash* of the key, never
  * by `rand()`.
  *
  * Hash-gate semantics: keep a row iff the first 8 hex digits of
  * `md5(key)` fall below `rate · 16^8`. Properties that matter at
  * 100 TB:
  *  - deterministic and idempotent — re-runs, retried tasks, and
  *    different partitionings all sample the identical subset (a
  *    `rand()` sample changes under AQE/retries and can't be
  *    oracle-checked);
  *  - map-side only — a pure projection filter, no shuffle, no state;
  *  - stable under union — sampling before or after combining shards
  *    selects the same ids;
  *  - portable — md5 hex is identical in every engine, so the gate is
  *    SQL-reproducible (lexicographic compare of lowercase hex ==
  *    numeric compare at equal width).
  *
  * Rate resolution is ≈ 2.3e-10 (1/2^32); rates quantize to that grid
  * (round), exact at the usual 0.5/0.25/0.1 mixing values.
  */
object Sampling {

  /** 8-hex-digit threshold for `rate`; "g" (> every hex digit) keeps
    * all, "0" keeps none — widths chosen so the string compare is the
    * numeric compare. */
  private[graft] def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "0"
    else f"${math.min(math.round(rate * 4294967296.0), 0xffffffffL)}%08x"

  /** The hash gate both samplers compare against a threshold. */
  private def gate(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Keep-predicate: first 8 md5 nibbles of `key` under the rate's
    * threshold. */
  def keep(key: Column, rate: Double): Column =
    gate(key) < lit(hexThreshold(rate))

  /** Uniform deterministic sample. */
  def uniform(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(keep(key, rate))

  /** Stratified deterministic sample: each row keeps with its
    * stratum's rate (`defaultRate` for strata not in the map). The
    * threshold rides a CASE on the stratum column, so the whole gate
    * stays one codegen'd projection filter. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double],
                 defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (s, r)) => when(stratum === s, hexThreshold(r)).otherwise(acc)
    }
    df.where(gate(key) < thr)
  }

  /** Temperature-flattened domain mixture (α-sampling — the mixing
    * rule multilingual/multi-source pretraining uses to keep head
    * domains from drowning tail ones; published practice, e.g. the
    * α = 0.5 exponent of the multilingual-BERT/XLM-R recipes):
    * per-domain budgets ∝ `weightOf(count)` normalized to `nTarget`
    * total rows, realized as the FIRST `budget_d` documents of each
    * domain in deterministic `orderKey` hash order, each kept row
    * carrying its in-domain rank in `rnk`.
    *
    * Where [[stratified]] needs the caller to hand it rates and only
    * hits them in expectation (hash-gate, binomial noise), this
    * derives the rates FROM the corpus and hits the budgets exactly
    * (`Batching.takeByBudgetsPerKey` — the q68 exact-count argument
    * applied to mixing).
    *
    * Integer-exact end to end, so the whole policy replays in any
    * engine: the default weight `⌊√count⌋` is exact in IEEE double
    * for counts < 2⁵⁰ (an integer's sqrt is ≥ 1/(2√c) away from the
    * nearest other integer — far beyond one ulp), the budget is one
    * decimal-widened multiply and an integral `div` (the q54 ppm
    * overflow discipline), and the order key is the md5 idiom. Any
    * integer-valued `weightOf` keeps the exactness; fractional
    * temperatures (count^α) ride on `pow`, whose last-ulp behavior
    * is libm-specific — such mixes stay spec-tested rather than
    * hash-compared, like every ln/exp surface here.
    *
    * Scale shape: one domain-cardinality count aggregate, a one-row
    * total broadcast, and the budget gate's range shuffle — the only
    * data-sized movement, identical to q48's. */
  def temperatureMix(df: DataFrame, domain: Column, id: Column,
                     nTarget: Long, partitions: Int = 32,
                     weightOf: Column => Column =
                       c => floor(sqrt(c)).cast("long"),
                     orderKey: Column => Column =
                       c => md5(c.cast("string"))): DataFrame = {
    require(nTarget >= 1, "nTarget must be positive")
    val counts = df.groupBy(domain.as("__bk"))
      .agg(count(lit(1)).as("__c"))
      .select(col("__bk"), weightOf(col("__c")).cast("long").as("__wt"))
    val tot = counts.agg(sum(col("__wt")).as("__tot"))
    // integral `div` on a decimal-widened numerator — the q54 ppm
    // discipline: exact, overflow-proof, and == DuckDB's `//`
    val budgets = counts.crossJoin(broadcast(tot))
      .select(col("__bk"),
        call_function("div",
          col("__wt").cast(org.apache.spark.sql.types.DecimalType(30, 0))
            * lit(nTarget),
          col("__tot").cast(org.apache.spark.sql.types.DecimalType(30, 0)))
          .cast("long").as("__budget"))
      .where(col("__budget") >= 1)
    graft.etl.Batching.takeByBudgetsPerKey(df,
      key = domain, order = struct(orderKey(id), id),
      weight = lit(1L), budgets = budgets, partitions = partitions,
      cumOut = "rnk")
  }
}
