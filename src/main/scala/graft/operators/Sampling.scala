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

  /** WEIGHT-proportional k-per-stratum sampling without replacement —
    * priority sampling (Duffield, Lund & Thorup, "Priority sampling
    * for estimation of arbitrary subset sums", JACM 54(6), 2007 — a
    * published method): each row draws u ∈ (0, 1] from the
    * deterministic hash gate and gets priority `p = w/u`; a
    * stratum's sample is its k largest priorities, and
    * `tau` = the (k+1)-largest priority yields the unbiased
    * per-row estimator `w_est = max(w, tau)` (Σ w_est over the
    * sample estimates the stratum's total weight; strata with ≤ k
    * rows are taken whole with `w_est = w` exactly, per the paper).
    * The weighted complement of [[temperatureMix]]: that one hits
    * COUNT budgets in hash order; this selects BY a per-row weight
    * (token counts, quality scores) with a principled estimator —
    * the shape a token-budgeted mixture wants when documents are
    * far from equal-sized.
    *
    * Over [[https://en.wikipedia.org/ A-ES]]-style `u^(1/w)` keys:
    * priorities need one division, not `pow` — `pow`'s last-ulp
    * behavior is libm-specific, which would demote the whole surface
    * to spec-only (the [[temperatureMix]] exactness discipline);
    * `w/u` with u = (h mod 2³¹ + 1)/2³¹ is two exact-integer casts
    * and two IEEE divisions, so selection, rank, tau, and estimator
    * all replay bit-identically in ANSI SQL.
    *
    * Determinism: u from `hashKey(key)` (content hash, never
    * `rand()` — idempotent under retries/AQE like every sampler
    * here); ties broken by key ascending. Scale shape: the rank
    * rides [[TopK.perGroup]]'s map-side group limit (shuffle moves
    * ≤ (k+1)·maps rows per stratum, never the table); weights and
    * priorities are a pure projection. Output: the sampled rows +
    * `(u, priority, rnk, tau, w_est)`; `tau` is null on ≤ k-row
    * strata. */
  def priorityPerStratum(df: DataFrame, key: Column, stratum: Column,
                         weight: Column, k: Int,
                         hashKey: Column => Column = xxhash64(_))
      : DataFrame = {
    require(k >= 1, "k must be at least 1")
    val m = 2147483648.0 // 2^31: u in (0, 1], exact double arithmetic
    val pr = df
      .withColumn("__u",
        (pmod(hashKey(key), lit(2147483648L)) + lit(1L))
          .cast("double") / lit(m))
      .withColumn("__w", weight.cast("double"))
      .withColumn("__p", col("__w") / col("__u"))
    // one extra rank: position k+1 is tau, the estimator's threshold
    val ranked = TopK.perGroup(pr, groups = Seq(stratum),
      order = Seq(col("__p").desc, key.asc), k = k + 1)
    val tau = ranked.where(col("rnk") === (k + 1))
      .groupBy(stratum.as("__st")).agg(first(col("__p")).as("tau"))
    ranked.where(col("rnk") <= k)
      .join(broadcast(tau), stratum === col("__st"), "left")
      .drop("__st")
      .withColumn("w_est",
        when(col("tau").isNull, col("__w"))
          .otherwise(greatest(col("__w"), col("tau"))))
      .withColumnRenamed("__u", "u")
      .withColumnRenamed("__p", "priority")
      .drop("__w")
  }
}
