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

  /** Distributed logistic trainer for the hashed-linear model: full-
    * batch gradient descent over a LABELED frame, expressed entirely
    * as DataFrame aggregates — no driver-side loop over rows, no
    * MLlib. Returns weights quantized to the integer [-1000, 1000]
    * array [[scoreWithWeights]] consumes, so train → score is a
    * closed loop: the scoring plan stays the zero-shuffle scan the
    * derived-weight form has (the weights ride in as one literal).
    *
    * Featurization is IDENTICAL to [[score]]/[[scoreWithWeights]]
    * (normalized unigrams + bigrams, hashed into `dim` buckets) —
    * trained weights are only as good as the train/score feature
    * match, so both derive from the same private builder. The model
    * optimizes logistic loss on the MEAN bucket weight (margin /
    * n_feats — exactly the quantity [[score]] thresholds at 0, so
    * p ≥ ½ ⇔ predicted label 1 and the sign survives positive
    * quantization scaling).
    *
    * Cost shape per epoch: one pass over the persisted (id, bucket,
    * cnt) feature frame — a doc-keyed aggregate for margins, a
    * doc-keyed join + bucket-keyed aggregate for the gradient — and
    * one dim-sized collect. The feature frame is labeled-set-sized,
    * not corpus-sized: quality classifiers train on a curated labeled
    * sample (10⁵–10⁶ docs) and SCORE the 100 TB corpus, so the
    * trainer's shuffles are bounded by the labeled set while the
    * scoring path stays shuffle-free. The dim-sized driver weight
    * array obeys the same size guidance as [[scoreWithWeights]]'s
    * literal (hundreds of thousands of buckets; one typedLit node
    * carries it into each epoch's plan). `labelCol` must be 0/1.
    *
    * `batchDenom` > 1 turns the full-batch pass into deterministic
    * mini-batch GD: epoch e sees the 1/batchDenom stratum whose
    * doc-hash residue is e mod batchDenom (the Sampling hash-gate
    * idiom — no RNG, so training replays bit-for-bit), every stratum
    * is visited once per batchDenom epochs, the gate prunes before
    * the margin aggregate so epoch cost shrinks with the batch, and
    * the gradient normalizes by the epoch's own doc count so the
    * per-doc step size is batchDenom-invariant. */
  def train(df: DataFrame, id: Column, text: Column, labelCol: Column,
            dim: Int, epochs: Int = 30, lr: Double = 1.0,
            l2: Double = 0.0,
            hashKey: Column => Column = xxhash64(_),
            batchDenom: Int = 1): Array[Int] =
    quantize(trainRaw(df, id, text, labelCol, dim, epochs, lr, l2,
      hashKey, batchDenom))

  /** [[train]] without the final quantization: the UNQUANTIZED
    * weights a daily re-fit pipeline persists and feeds back as
    * `initWeights` tomorrow (warm start — quantized weights lose the
    * magnitude GD needs to continue from). Full-batch training is
    * deterministic, so continuing for e₂ epochs from an e₁-epoch
    * result IS the e₁+e₂ straight-through result, element for
    * element — the spec asserts exact equality, which is what makes
    * daily warm starts trustworthy rather than approximately-right.
    * (With `batchDenom` > 1 the stratum schedule restarts at epoch
    * 0 on each call, so continuation visits strata in a different
    * order than straight-through — same fixed point, not the same
    * trajectory.) */
  def trainRaw(df: DataFrame, id: Column, text: Column, labelCol: Column,
               dim: Int, epochs: Int = 30, lr: Double = 1.0,
               l2: Double = 0.0,
               hashKey: Column => Column = xxhash64(_),
               batchDenom: Int = 1,
               initWeights: Array[Double] = Array.empty): Array[Double] = {
    require(dim >= 1, "feature dimension must be positive")
    require(epochs >= 1, "epochs must be positive")
    require(batchDenom >= 1, "batchDenom must be positive")
    require(initWeights.isEmpty || initWeights.length == dim,
      s"initWeights length ${initWeights.length} != dim $dim")
    val feats = featureBuckets(df, id, text, dim, hashKey)
      .join(df.select(id.as("id"), labelCol.cast("double").as("y")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w =
        if (initWeights.isEmpty) Array.fill(dim)(0.0)
        else initWeights.clone()
      for (e <- 0 until epochs) {
        // mini-batch gate: epoch e sees the 1/batchDenom stratum
        // whose doc-hash residue is e mod batchDenom — deterministic
        // (same Sampling hash-gate idiom, no RNG to break replay),
        // every stratum visited each batchDenom epochs, and the
        // filter prunes BEFORE the margin aggregate so an epoch's
        // cost shrinks by the same factor the batch does.
        // batchDenom=1 (default) is exact full-batch GD.
        val batch =
          if (batchDenom == 1) feats
          else feats.where(
            pmod(xxhash64(col("id")), lit(batchDenom.toLong))
              === lit((e % batchDenom).toLong))
        // normalize by the docs THIS epoch sees, so the per-doc
        // step size is batchDenom-invariant (for batchDenom=1 this
        // is the full labeled set, the exact full-batch GD)
        val nEpoch = batch.select(col("id")).distinct().count().toDouble
        if (nEpoch > 0) {
          val warr = typedLit(w.toSeq)
          val p = batch.groupBy("id", "y", "n")
            .agg(sum(col("cnt") *
              element_at(warr, (col("b") + 1L).cast("int"))).as("m"))
            .select(col("id"),
              (lit(1.0) / (lit(1.0) + exp(-col("m") / col("n")))).as("p"))
          val grad = batch.join(p, "id")
            .groupBy("b")
            .agg(sum((col("p") - col("y")) * col("cnt") / col("n")).as("g"))
            .collect()
          grad.foreach { r =>
            val b = r.getLong(0).toInt
            w(b) -= lr * (r.getDouble(1) / nEpoch + l2 * w(b))
          }
        }
      }
      require(w.exists(_ != 0.0) || epochs == 0,
        "training saw no scoreable labeled documents")
      w
    } finally feats.unpersist()
  }

  /** Positive-scale quantization to [[scoreWithWeights]]'s integer
    * range: sign (and so every predicted label) is preserved. */
  def quantize(w: Array[Double]): Array[Int] = {
    val mx = math.max(w.iterator.map(math.abs).maxOption.getOrElse(0.0), 1e-12)
    w.map(x => math.round(x / mx * 1000.0).toInt)
  }

  /** Shared featurization, factored so train and score cannot drift:
    * one row per (doc, bucket) with its in-doc count and the doc's
    * total feature count. */
  private def featureBuckets(df: DataFrame, id: Column, text: Column,
                             dim: Int, hashKey: Column => Column)
      : DataFrame =
    df.select(id.as("id"), split(Cleanser.normalized(text), " ").as("__w"))
      .where(size(col("__w")) >= 1)
      .select(col("id"),
        concat(col("__w"), TextFns.bigramArray(col("__w"))).as("__f"))
      .select(col("id"), size(col("__f")).cast("double").as("n"),
        explode(transform(col("__f"),
          t => pmod(hashKey(t), lit(dim.toLong)))).as("b"))
      .groupBy("id", "n", "b").agg(count(lit(1)).cast("double").as("cnt"))

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
