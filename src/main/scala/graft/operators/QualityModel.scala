package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Cleanser

/** Hashed-linear quality scoring — the fastText/CCNet-shaped quality
  * filter every pretraining pipeline runs before mixing (score each
  * document with a linear model over hashed n-gram features, keep
  * above threshold), re-expressed as pure Column algebra.
  *
  * Structure (the operator's contract):
  *  - features = normalized unigrams + adjacent bigrams (the fastText
  *    default), each hashed into one of `dim` buckets — the hashing
  *    trick, so the feature space is fixed-width regardless of
  *    vocabulary;
  *  - each bucket carries an INTEGER-quantized weight in
  *    [-1000, 1000], derived deterministically by re-hashing the
  *    bucket id (the stand-in for trained weights — production
  *    quantized classifiers ship exactly this shape, and a real
  *    deployment swaps the derivation for a broadcast weight array
  *    lookup without touching the plan);
  *  - a document's margin is the SUM of its feature weights: exact
  *    Long arithmetic, order-free, map-side only — no shuffle, no
  *    floating-point accumulation, so the scale plan is a bare scan
  *    and the seeded variant replays hash-identically in DuckDB.
  *
  * Two hash families, as the dedup operators: xxhash64 (the scale
  * path, rows-only at the query surface) and the 60-bit md5 prefix
  * (`conv(substring(md5(t), 1, 15), 16, 10)` == DuckDB
  * `CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)`) for the
  * oracle-green twin.
  */
object QualityModel {

  /** The md5-prefix hash key (engine-portable oracle twin). */
  val seededKey: Column => Column =
    t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Per-document linear score `(id, n_feats, margin, score, label)`:
    * margin = Σ weight(bucket(feature)) exactly in Longs; score =
    * margin / n_feats (ONE double division at the end); label =
    * 1 iff margin ≥ 0. Docs with no tokens (null/unsplittable text)
    * are excluded — they have no features to score. */
  def score(df: DataFrame, id: Column, text: Column, dim: Int,
            hashKey: Column => Column = xxhash64(_)): DataFrame =
    scoreBy(df, id, text, dim, hashKey,
      // per-feature integer weight: bucket = hash(token) mod dim,
      // weight = hash(bucket) mod 2001 - 1000; pmod, not %, because
      // xxhash64 goes negative (the md5 60-bit prefix never does —
      // DuckDB's plain % on it matches)
      b => pmod(hashKey(b.cast("string")), lit(2001L)) - lit(1000L))

  /** [[score]] with TRAINED weights: `weights(b)` is the quantized
    * weight of feature bucket `b`, carried as one literal array —
    * broadcast-by-construction (the array rides the serialized plan
    * to every executor), so the query keeps the derived-weight
    * form's ZERO-shuffle scan-projection plan (spec-asserted
    * identical shape). The per-element `lit` array caps out at a few
    * hundred thousand buckets — beyond that, Catalyst pays for one
    * `CreateArray` CHILD per weight in plan construction,
    * serialization and codegen (a 2M-bucket fastText-sized model is
    * ~2 MB of DATA but 2M expression nodes — pathological long
    * before the bytes matter). Past the threshold either pass the
    * weights as ONE node (`functions.typedLit(weights.toSeq)`, a
    * single Literal holding the array, same zero-shuffle plan) or
    * move to an explicit `broadcast()` dim-frame join + per-doc
    * re-aggregate — one shuffle keyed by doc id. */
  def scoreWithWeights(df: DataFrame, id: Column, text: Column,
                       weights: Array[Int],
                       hashKey: Column => Column = xxhash64(_))
      : DataFrame = {
    val warr = array(weights.map(w => lit(w.toLong)): _*)
    scoreBy(df, id, text, weights.length, hashKey,
      b => element_at(warr, (b + 1L).cast("int")))
  }

  private def scoreBy(df: DataFrame, id: Column, text: Column, dim: Int,
                      hashKey: Column => Column,
                      weightOf: Column => Column): DataFrame = {
    require(dim >= 1, "feature dimension must be positive")
    df.select(id.as("id"), split(Cleanser.normalized(text), " ").as("__w"))
      .where(size(col("__w")) >= 1)
      .select(col("id"),
        concat(col("__w"), TextFns.bigramArray(col("__w"))).as("__f"))
      .select(col("id"), size(col("__f")).cast("long").as("n_feats"),
        aggregate(
          transform(col("__f"),
            t => weightOf(pmod(hashKey(t), lit(dim.toLong)))),
          lit(0L), (acc, w) => acc + w).as("margin"))
      .select(col("id"), col("n_feats"), col("margin"),
        (col("margin").cast("double") / col("n_feats")).as("score"),
        when(col("margin") >= 0, lit(1)).otherwise(lit(0)).as("label"))
  }
}
