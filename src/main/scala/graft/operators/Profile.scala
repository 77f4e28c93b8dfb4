package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling: per-column `(column, n, n_null,
  * n_distinct, min_s, max_s)` — the DESCRIBE/df.describe analog as
  * an oracle-checkable DataFrame — plus, for declared numeric
  * columns, the exact-moment `(mean, stddev)` pair.
  *
  * Scale shape: ONE aggregate over the table computes every
  * column's statistics side by side (the multi-distinct plans as a
  * single Expand + aggregate — one shuffle regardless of how many
  * columns are profiled), then the single result row explodes into
  * per-column rows. k columns never cost k scans.
  *
  * Typed min/max are cast to string AFTER aggregating (a string min
  * of "10" < "9" would be wrong for numerics). Exact-typed columns
  * only (integers, strings, dates) in `cols` by the caller's
  * contract: double→string rendering is not engine-portable at the
  * scientific notation boundary. Double columns go in `numericCols`
  * instead, where the whole profile runs over the column's
  * DECIMAL(18,2) view (the corpus's money/quantity shape): fixed-
  * point min/max render portably, and mean/stddev follow the
  * [[Stats]] discipline — exact DECIMAL sums `Σx, Σx²` (any
  * partial-aggregation order produces the SAME sums), then one
  * fixed double expression tree (`mean = Σx/m`, sample
  * `stddev = sqrt((m·Σx² − (Σx)²) / (m·(m−1)))`, `m` the non-null
  * count), so both replay bit-identically in SQL. `mean` is null
  * when a column has no non-null rows, `stddev` when fewer than
  * two; exact-typed columns carry null moments. The variance
  * numerator is clamped at 0 before the sqrt: the two double
  * products can round a true zero variance epsilon-negative, and a
  * NaN would be an engine-dependent spelling.
  *
  * The DECIMAL view is a `try_cast`, and the profile reports
  * `n_cast_fail` per numeric column (NaN/±Inf/|x| ≥ 10^16 — values
  * the fixed-point view can't hold): a profiler is precisely the
  * tool pointed at dirty data, so a plain ANSI cast would CRASH the
  * whole pass on the first bad value, and a silent non-ANSI cast
  * would fold bad values into `n_null` invisibly. Instead `n_null`
  * counts RAW nulls only, failures get their own loud column, and
  * min/max/distinct/moments describe the castable values.
  */
object Profile {

  /** The shared per-column aggregate block over `key` (the profiled
    * view of the column: the column itself, or its DECIMAL cast). */
  private def baseAggs(c: String, key: Column): Seq[Column] = Seq(
    sum(when(key.isNull, 1L).otherwise(0L)).as(s"__null_$c"),
    min(key).cast("string").as(s"__min_$c"),
    max(key).cast("string").as(s"__max_$c"))

  private def explodeProfile(agged: DataFrame, perCol: Seq[Column],
                             outCols: Seq[(String, String)]): DataFrame =
    agged
      .select(col("__n"), explode(array(perCol: _*)).as("__p"))
      .select((col("__p.column").as("column") +: col("__n").as("n") +:
        outCols.map { case (f, out) => col(s"__p.$f").as(out) }): _*)

  def describe(df: DataFrame, cols: Seq[String],
               numericCols: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty || numericCols.nonEmpty,
      "profile needs at least one column")
    require(cols.intersect(numericCols).isEmpty,
      "a column is either exact-typed or numeric, not both")
    val all = cols ++ numericCols
    require(all.distinct.size == all.size,
      s"duplicate profile columns: ${all.diff(all.distinct).mkString(", ")}")
    // a non-numeric column would survive the DECIMAL cast as nulls
    // and profile as 100% null with null moments — silently wrong;
    // reject the declaration instead
    // resolve the field the way the engine resolves col(c) — the
    // session's resolver (case-insensitive by default), not a
    // case-sensitive schema lookup that would reject a column the
    // query itself accepts
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    numericCols.foreach { c =>
      val field = df.schema.find(f => resolver(f.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"numericCols column $c not found in ${df.columns.mkString(", ")}"))
      require(field.dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"numericCols column $c has type ${field.dataType} — only " +
          "numeric columns (a failed cast would profile as nulls)")
    }
    // try_cast: a NaN/Inf/overflow value must neither crash the
    // pass (ANSI cast) nor silently count as a null (non-ANSI) —
    // it is counted loudly in n_cast_fail instead
    val dec = numericCols.map(c =>
      c -> expr(s"try_cast(`$c` AS DECIMAL(18,2))")).toMap
    val aggs = count(lit(1)).as("__n") +:
      (cols.flatMap { c =>
        baseAggs(c, col(c)) :+ count_distinct(col(c)).as(s"__dist_$c")
      } ++ numericCols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          sum(when(col(c).isNotNull && dec(c).isNull, 1L).otherwise(0L))
            .as(s"__fail_$c"),
          min(dec(c)).cast("string").as(s"__min_$c"),
          max(dec(c)).cast("string").as(s"__max_$c"),
          count_distinct(dec(c)).as(s"__dist_$c"),
          sum(dec(c)).as(s"__sx_$c"),
          sum(dec(c) * dec(c)).as(s"__sxx_$c"))
      })
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val nullD = lit(null).cast("double")
    val nullL = lit(null).cast("bigint")
    val exactStructs = cols.map { c =>
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"),
        nullL.as("n_cast_fail"), nullD.as("mean"), nullD.as("stddev"))
    }
    val numStructs = numericCols.map { c =>
      // moments over the CASTABLE values: failures are excluded and
      // visible, never folded into the null count or the mean
      val md = (col("__n") - col(s"__null_$c") - col(s"__fail_$c"))
        .cast("double")
      val sxd = col(s"__sx_$c").cast("double")
      val sxxd = col(s"__sxx_$c").cast("double")
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"),
        col(s"__fail_$c").as("n_cast_fail"),
        when(md > 0.0, sxd / md).as("mean"),
        when(md > 1.0,
          sqrt(greatest(lit(0.0),
            (md * sxxd - sxd * sxd) / (md * (md - lit(1.0))))))
          .as("stddev"))
    }
    val fields = Seq("n_null" -> "n_null", "n_distinct" -> "n_distinct",
      "min_s" -> "min_s", "max_s" -> "max_s")
    val numExtras = Seq("n_cast_fail" -> "n_cast_fail",
      "mean" -> "mean", "stddev" -> "stddev")
    // numericCols = Nil keeps the original six-column surface
    if (numericCols.isEmpty) explodeProfile(agged, exactStructs, fields)
    else explodeProfile(agged, exactStructs ++ numStructs,
      fields ++ numExtras)
  }

  /** [[describe]] plus per-numeric-column quantiles read off an
    * [[Hdr]] histogram — the completion of the DESCRIBE analog
    * (count/null/distinct/min/max/mean/stddev/p50..p99 in one call).
    *
    * Quantile semantics: each numeric column's DECIMAL(18,2) view is
    * scaled to integer CENTS (`×100`, exact — the view's whole
    * domain fits a Long) and folded into the log-linear Hdr frame;
    * the `p<q>_c` outputs are CENT-scaled `percentile_disc`-style
    * estimates (`est ≤ true`, relative error ≤ 2^−b — the Hdr
    * envelope), as BIGINT: integer arithmetic end-to-end, so the
    * surface replays bit-identically in SQL with no decimal-division
    * portability risk. The quantile view covers the NON-NEGATIVE
    * castable values (the Hdr domain — counts/lengths/money);
    * a column with negative values gets quantiles of its
    * non-negative part, and `n_null`/`n_cast_fail` still come from
    * the full profile. Exact-typed columns carry null quantiles.
    *
    * Plan shape — the documented TWO-scan trade: [[describe]] stays
    * one Expand-aggregate scan; the histogram is a second aggregate
    * with a different key (per-(column, bucket)) that CANNOT ride
    * the same Expand without materializing every bucket id as a
    * static aggregate expression (~2k columns per profiled column —
    * a codegen explosion, not a plan). The second scan union-tags
    * all numeric columns at once ((column, cents) pairs via one
    * exploded map), so its shuffle is the per-task partial-aggregated
    * bucket set — k numeric columns cost ONE extra scan total, never
    * k. ProfileSpec pins scans == 2. */
  def describeWithQuantiles(df: DataFrame, cols: Seq[String],
                            numericCols: Seq[String],
                            qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                            b: Int = Hdr.DefaultBits): DataFrame = {
    require(numericCols.nonEmpty,
      "describeWithQuantiles needs at least one numeric column")
    require(qs.nonEmpty && qs.forall(q =>
        q > 0.0 && q <= 1.0 && (q * 100) == math.rint(q * 100)),
      "quantile probes must be whole percents in (0, 1]")
    require(qs.distinct.size == qs.size, "duplicate quantile probes")
    def pName(q: Double) = s"p${math.rint(q * 100).toInt}_c"
    val base = describe(df, cols, numericCols)
    // pass 2: every numeric column's cents, union-tagged through one
    // exploded map — one scan and one (column, bucket)-keyed
    // aggregate for ALL columns; a failed cast explodes as a null
    // entry and the Hdr frame drops it (consistent with n_cast_fail
    // exclusion from the moments)
    val pairs = numericCols.flatMap(c => Seq(lit(c),
      (expr(s"try_cast(`$c` AS DECIMAL(18,2))") * 100).cast("long")))
    val tagged = df.select(explode(
      map(pairs: _*)).as(Seq("column", "__cents")))
    val hist = Hdr.frame(tagged, col("__cents"), b,
      groupCols = Seq("column"))
    val qCols = qs.map(q =>
      max(when(col("q") === q, col("est"))).as(pName(q)))
    val quants = Hdr.quantiles(hist, qs, groupCols = Seq("column"))
      .groupBy(col("column"))
      .agg(qCols.head, qCols.tail: _*)
    base.join(quants, Seq("column"), "left")
  }

  /** [[describe]] with the distinct count approximated: the exact
    * `count_distinct` is the profile's one vocabulary-sized shuffle
    * (every distinct value of every column travels — the q65/q66
    * regime), which at 100 TB dominates the whole pass. Spark's
    * `approx_count_distinct` is a per-column HyperLogLog++ register
    * set that partial-aggregates map-side — the shuffle carries a
    * FIXED few-KB sketch per column instead, and the profile
    * becomes one genuinely corpus-sized-input, sketch-sized-shuffle
    * pass. `rsd` is the target relative standard deviation (Spark's
    * default 0.05); the spec bounds the estimate against the exact
    * twin at 3×rsd. Column named `n_distinct_approx`: an estimate
    * never masquerades as the exact surface. */
  def describeApprox(df: DataFrame, cols: Seq[String],
                     rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"duplicate profile columns: ${
        cols.diff(cols.distinct).mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      baseAggs(c, col(c)) :+
        approx_count_distinct(col(c), rsd).as(s"__dist_$c")
    }
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct_approx"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    explodeProfile(df.agg(aggs.head, aggs.tail: _*), perCol,
      Seq("n_null" -> "n_null", "n_distinct_approx" -> "n_distinct_approx",
        "min_s" -> "min_s", "max_s" -> "max_s"))
  }
}
