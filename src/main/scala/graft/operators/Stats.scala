package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment statistics: grouped ordinary-least-squares fit and
  * Pearson correlation computed from DECIMAL second-moment sums —
  * the engine-portable alternative to `corr`/`covar_samp`, whose
  * double accumulation is partial-aggregation-order-dependent (and
  * so can differ run-to-run at scale, let alone engine-to-engine).
  *
  * Discipline: the five sums (`Σx, Σy, Σxy, Σx², Σy²`) accumulate
  * in exact DECIMAL (2-decimal inputs → scale-4 products, 38-digit
  * headroom), so any partial-aggregation order produces the SAME
  * sums; the closed forms then run one fixed double expression tree
  * (multiplies, divides, `sqrt` — all IEEE-correctly-rounded, the
  * `Hll.hllEstimate` discipline), so slope/intercept/r replay
  * bit-identically in SQL. Groups without variance in `x` (the
  * zero denominator) are filtered out rather than emitting
  * engine-dependent Inf/NaN spellings — the caller's contract.
  *
  * Scale shape: ONE grouped aggregate with map-side partials (the
  * five sums are each one DECIMAL per group per task); the closed
  * forms are per-group scalar algebra. Nothing is collected, no
  * second pass — this is the textbook one-pass moments regression.
  */
object Stats {

  /** Per-group OLS fit of `y` on `x`: `(group..., n, slope,
    * intercept, r)` — `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`,
    * `intercept = (Σy − slope·Σx)/n`, `r` the Pearson correlation.
    * Inputs are cast to DECIMAL(18,2) (the corpus's money/quantity
    * shape); rows with a null in either column are excluded, as are
    * groups with zero x-variance or zero y-variance (r undefined). */
  def linearFit(df: DataFrame, x: Column, y: Column,
                groupCols: Seq[String] = Nil): DataFrame = {
    val xd = x.cast("decimal(18,2)")
    val yd = y.cast("decimal(18,2)")
    val grouped =
      if (groupCols.isEmpty) df.where(x.isNotNull && y.isNotNull).groupBy()
      else df.where(x.isNotNull && y.isNotNull)
        .groupBy(groupCols.map(col): _*)
    val sums = grouped.agg(
      count(lit(1)).as("n"),
      sum(xd).as("sx"), sum(yd).as("sy"),
      sum(xd * yd).as("sxy"),
      sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double"); val syd = col("sy").cast("double")
    val sxyd = col("sxy").cast("double")
    val sxxd = col("sxx").cast("double"); val syyd = col("syy").cast("double")
    val denX = nd * sxxd - sxd * sxd
    val denY = nd * syyd - syd * syd
    val num = nd * sxyd - sxd * syd
    sums
      .where(denX =!= 0.0 && denY =!= 0.0)
      .select((groupCols.map(col) :+ col("n") :+
        (num / denX).as("slope") :+
        ((syd - (num / denX) * sxd) / nd).as("intercept") :+
        (num / sqrt(denX * denY)).as("r")): _*)
  }
}
