package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Cleanser

/** Data selection via importance resampling — DSIR (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023, a published method): estimate hashed-n-gram
  * bag-of-features distributions for a small TARGET corpus (the data
  * you wish you had more of) and the RAW corpus (the data you have),
  * weight every raw document by the likelihood ratio
  * `w(x) = p_target(feats(x)) / p_raw(feats(x))`, and resample the
  * raw corpus ∝ w — the principled version of "pick documents that
  * look like the target".
  *
  * Composition is the point: featurization is EXACTLY
  * [[QualityModel]]'s (normalized unigrams + bigrams hashed into
  * `dim` buckets — train/score cannot drift), per-document log-weight
  * is [[QualityModel.scoreWithWeights]]'s zero-Exchange integer
  * margin under FIXED-SCALE quantized log-ratio weights, and the
  * resample is the Gumbel-top-k equivalence (Efraimidis–Spirakis
  * weighted sampling without replacement: top-k of
  * `log w + Gumbel(u)`), with `u` a hash of the document id — no
  * RNG, bit-replayable, and ranked by the two-phase [[TopK]]
  * aggregate, never a single-partition window.
  *
  * Scale shape: both bucket-count tables are `dim`-sized (driver
  * KBs); estimating them is one map-side-combined aggregate per
  * corpus; scoring the 100 TB raw corpus is a bare scan (the weights
  * ride the plan as one literal array); the top-k is the only
  * data-sized aggregate. The integer count core
  * ([[scoreCounts]]) is the oracle-checked twin; the log-ratio
  * weights and Gumbel keys are the declared rows-only float
  * surface. */
object Dsir {

  private def featureStream(df: DataFrame, id: Column, text: Column,
                            dim: Int, hashKey: Column => Column)
      : DataFrame =
    df.select(id.as("id"),
        split(Cleanser.normalized(coalesce(text, lit(""))), " ").as("__w"))
      .where(size(col("__w")) >= 1 &&
        length(element_at(col("__w"), 1)) > 0)
      .select(col("id"), explode(transform(
        concat(col("__w"), TextFns.bigramArray(col("__w"))),
        t => pmod(hashKey(t), lit(dim.toLong)))).as("b"))

  /** Hashed-bucket occurrence counts `(b, c)` of a corpus — the
    * sufficient statistic DSIR's bag-of-features model needs; one
    * map-side-combined aggregate, output `dim`-bounded. */
  def bucketCounts(df: DataFrame, id: Column, text: Column, dim: Int,
                   hashKey: Column => Column = xxhash64(_)): DataFrame =
    featureStream(df, id, text, dim, hashKey)
      .groupBy("b").agg(count(lit(1)).as("c"))

  /** The integer scoring core `(id, n_feats, sum_ct, sum_cr)`: per
    * raw document, its feature count and the summed target/raw
    * bucket count mass — pure longs, the oracle-checked twin of the
    * float log-ratio surface. The join is bucket-keyed against two
    * `dim`-sized tables (broadcast-sized by construction). */
  def scoreCounts(docs: DataFrame, id: Column, text: Column,
                  targetCounts: DataFrame, rawCounts: DataFrame,
                  dim: Int,
                  hashKey: Column => Column = xxhash64(_)): DataFrame =
    featureStream(docs, id, text, dim, hashKey)
      .join(broadcast(targetCounts.select(col("b"),
        col("c").as("__ct"))), Seq("b"), "left")
      .join(broadcast(rawCounts.select(col("b"),
        col("c").as("__cr"))), Seq("b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("__ct"), lit(0L))).as("sum_ct"),
        sum(coalesce(col("__cr"), lit(0L))).as("sum_cr"))

  /** Fixed-scale quantized log-ratio weights:
    * `w[b] = round(scale · (log p̂_t(b) − log p̂_r(b)))` under add-α
    * smoothing. FIXED scale, not max-normalized ([[QualityModel
    * .quantize]]'s contract) — the Gumbel resample needs margins in
    * true log units (`margin / scale = log w`), and a
    * max-normalizing quantizer would silently rescale the noise
    * trade-off. Driver math over two `dim`-sized collects. */
  def importanceWeights(target: DataFrame, raw: DataFrame,
                        id: Column, text: Column, dim: Int,
                        alpha: Double = 0.5, scale: Int = 1000,
                        hashKey: Column => Column = xxhash64(_))
      : Array[Int] = {
    require(alpha > 0 && scale >= 1)
    def collectCounts(df: DataFrame): Array[Long] = {
      val arr = Array.ofDim[Long](dim)
      bucketCounts(df, id, text, dim, hashKey).collect()
        .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val ct = collectCounts(target)
    val cr = collectCounts(raw)
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    Array.tabulate(dim) { b =>
      val lt = math.log((ct(b) + alpha) / (nt + alpha * dim))
      val lr = math.log((cr(b) + alpha) / (nr + alpha * dim))
      math.round((lt - lr) * scale).toInt
    }
  }

  /** Per-document quantized log-importance — exactly
    * [[QualityModel.scoreWithWeights]] under the log-ratio weights:
    * `margin / scale ≈ log w(x)`, computed by a ZERO-Exchange scan
    * (the quality-model plan, spec-asserted there). Note the
    * method's inherent LENGTH BIAS: the weight is a likelihood-ratio
    * product over features, so longer documents accumulate more
    * (typically negative) log mass regardless of content; the
    * returned frame also carries `score` = margin / n_feats, the
    * length-normalized per-feature mean, for pipelines that prefer
    * content over brevity. */
  def logImportance(docs: DataFrame, id: Column, text: Column,
                    weights: Array[Int],
                    hashKey: Column => Column = xxhash64(_)): DataFrame =
    QualityModel.scoreWithWeights(docs, id, text, weights, hashKey)

  /** Importance-resample `k` documents without replacement,
    * deterministically: top-k of `log w + Gumbel(u(id))` with
    * `u(id)` a 40-bit hash of the id (and `seed`) mapped into (0,1)
    * — the Gumbel-max equivalence of sampling ∝ w without
    * replacement. Returns `(id, rnk, margin, key)`, rank 1 = first
    * draw. Ranking is the two-phase [[TopK.perGroup]] aggregate
    * (partial top-k per partition, merged — never a global sort or
    * single-partition window). */
  def resample(docs: DataFrame, id: Column, text: Column,
               weights: Array[Int], k: Int, scale: Int = 1000,
               seed: Long = 0L,
               hashKey: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1)
    val m = 1L << 40
    val scored = logImportance(docs, id, text, weights, hashKey)
    val u = (pmod(xxhash64(col("id"), lit(seed)), lit(m)) +
      lit(0.5)) / lit(m.toDouble)
    val keyed = scored.withColumn("__key",
      col("margin").cast("double") / scale - log(-log(u)))
    TopK.perGroup(keyed, Seq(lit(1).as("__g")),
        Seq(col("__key").desc, col("id")), k)
      .select(col("id"), col("rnk"), col("margin"),
        col("__key").as("key"))
  }
}
