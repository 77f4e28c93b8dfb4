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
}
