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
            batchDenom: Int = 1, historySize: Int = 0): Array[Int] =
    quantize(trainRaw(df, id, text, labelCol, dim, epochs, lr, l2,
      hashKey, batchDenom, historySize = historySize))

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
    * trajectory.)
    *
    * `historySize` > 0 switches the update from plain GD to an
    * L-BFGS history fold: the last `historySize` (step, gradient-
    * change) pairs approximate curvature through the standard
    * two-loop recursion, and each epoch takes one Armijo-backtracked
    * step along the resulting direction. The DISTRIBUTED work per
    * epoch stays DataFrame aggregates over the same persisted
    * feature frame — one gradient pass plus one loss pass per
    * line-search trial (≤ 5); the history fold itself is
    * O(historySize · dim) driver arithmetic on the weight array the
    * driver already holds for the typedLit. Requires full-batch
    * gradients (`batchDenom` == 1): curvature pairs from different
    * strata approximate different functions and corrupt the fold.
    * Worth the extra passes when plain GD needs many epochs — the
    * spec measures the planted-signal corpus converging in a quarter
    * of the epochs; each epoch's passes scan the labeled-set-sized
    * frame, never the scoring corpus. */
  def trainRaw(df: DataFrame, id: Column, text: Column, labelCol: Column,
               dim: Int, epochs: Int = 30, lr: Double = 1.0,
               l2: Double = 0.0,
               hashKey: Column => Column = xxhash64(_),
               batchDenom: Int = 1,
               initWeights: Array[Double] = Array.empty,
               historySize: Int = 0): Array[Double] = {
    require(dim >= 1, "feature dimension must be positive")
    require(epochs >= 1, "epochs must be positive")
    require(batchDenom >= 1, "batchDenom must be positive")
    require(historySize >= 0, "historySize must be non-negative")
    require(historySize == 0 || batchDenom == 1,
      "the L-BFGS history fold needs full-batch gradients (batchDenom == 1)")
    require(initWeights.isEmpty || initWeights.length == dim,
      s"initWeights length ${initWeights.length} != dim $dim")
    val feats = featureBuckets(df, id, text, dim, hashKey)
      .join(df.select(id.as("id"), labelCol.cast("double").as("y")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (historySize > 0)
        return trainLbfgs(feats, dim, epochs, lr, l2, historySize,
          initWeights)
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

  /** The L-BFGS epoch loop behind [[trainRaw]]'s `historySize`:
    * standard two-loop recursion over the last `m` curvature pairs,
    * one Armijo-backtracked step per epoch (c₁ = 1e-4, halving from
    * `lr`, ≤ 5 trials — an exhausted search takes the smallest trial,
    * progress over stall; a pair enters the history only past the
    * `sᵀy > 0` curvature guard). Distributed work = the gradient
    * pass + one loss pass per trial, all over the SAME persisted
    * feature frame; the recursion is O(m·dim) driver arithmetic.
    * One deliberate difference from the GD branch: the gradient is
    * DENSE — `l2·w(b)` applies to every bucket, not only buckets the
    * epoch's documents touch — because the curvature pairs assume
    * the true full gradient of the regularized objective. */
  private def trainLbfgs(feats: DataFrame, dim: Int, epochs: Int,
                         lr: Double, l2: Double, m: Int,
                         initWeights: Array[Double]): Array[Double] = {
    val nDocs = feats.select(col("id")).distinct().count().toDouble
    require(nDocs > 0, "training saw no scoreable labeled documents")
    def margins(w: Array[Double]): DataFrame = {
      val warr = typedLit(w.toSeq)
      feats.groupBy("id", "y", "n")
        .agg(sum(col("cnt") *
          element_at(warr, (col("b") + 1L).cast("int"))).as("m"))
    }
    // mean logistic loss + L2, numerically stable softplus:
    // ln(1+e^u) = max(u,0) + ln1p(e^-|u|)
    def lossAt(w: Array[Double]): Double = {
      val u = -(col("y") * 2d - 1d) * (col("m") / col("n"))
      val s = margins(w)
        .select((greatest(u, lit(0.0)) + log1p(exp(-abs(u)))).as("l"))
        .agg(sum(col("l"))).head().getDouble(0)
      s / nDocs + 0.5 * l2 * w.iterator.map(x => x * x).sum
    }
    def gradAt(w: Array[Double]): Array[Double] = {
      val p = margins(w).select(col("id"),
        (lit(1.0) / (lit(1.0) + exp(-col("m") / col("n")))).as("p"))
      val g = Array.fill(dim)(0.0)
      feats.join(p, "id").groupBy("b")
        .agg(sum((col("p") - col("y")) * col("cnt") / col("n")).as("g"))
        .collect().foreach { r =>
          g(r.getLong(0).toInt) = r.getDouble(1) / nDocs }
      var b = 0
      while (b < dim) { g(b) += l2 * w(b); b += 1 }
      g
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val sH = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val yH = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var w =
      if (initWeights.isEmpty) Array.fill(dim)(0.0)
      else initWeights.clone()
    var g = gradAt(w)
    var loss = lossAt(w)
    for (_ <- 0 until epochs) {
      val q = g.clone()
      val alpha = new Array[Double](sH.length)
      for (i <- sH.length - 1 to 0 by -1) {
        val rho = 1.0 / dot(yH(i), sH(i))
        alpha(i) = rho * dot(sH(i), q)
        var j = 0; while (j < dim) { q(j) -= alpha(i) * yH(i)(j); j += 1 }
      }
      if (sH.nonEmpty) {
        val gamma = dot(sH.last, yH.last) / dot(yH.last, yH.last)
        var j = 0; while (j < dim) { q(j) *= gamma; j += 1 }
      }
      for (i <- sH.indices) {
        val rho = 1.0 / dot(yH(i), sH(i))
        val beta = rho * dot(yH(i), q)
        var j = 0
        while (j < dim) { q(j) += (alpha(i) - beta) * sH(i)(j); j += 1 }
      }
      val gTd = -dot(g, q) // g·d for the Armijo bound (d = -q)
      var t = lr
      var wNew: Array[Double] = null
      var lNew = 0.0
      var tries = 0
      var accepted = false
      while (!accepted && tries < 5) {
        wNew = Array.tabulate(dim)(j => w(j) - t * q(j))
        lNew = lossAt(wNew)
        if (lNew <= loss + 1e-4 * t * gTd) accepted = true
        else { t /= 2; tries += 1 }
      }
      val gNew = gradAt(wNew)
      val sv = Array.tabulate(dim)(j => wNew(j) - w(j))
      val yv = Array.tabulate(dim)(j => gNew(j) - g(j))
      if (dot(sv, yv) > 1e-12) {
        sH += sv; yH += yv
        if (sH.length > m) { sH.remove(0); yH.remove(0) }
      }
      w = wNew; g = gNew; loss = lNew
    }
    require(w.exists(_ != 0.0),
      "training saw no scoreable labeled documents")
    w
  }

  /** Platt calibration (Platt 1999, "Probabilistic Outputs for
    * Support Vector Machines…" — the published method): fit
    * `P(y=1 | f) = 1 / (1 + exp(A·f + B))` over a labeled scored
    * frame, so the model's raw margin-per-feature score becomes a
    * PROBABILITY a downstream mixing policy can threshold or weight
    * by. Returns `(A, B)`; [[withProbability]] applies them.
    *
    * Fitting is Newton's method on the 2-parameter negative
    * log-likelihood with Platt's smoothed targets
    * (`t⁺ = (N⁺+1)/(N⁺+2)`, `t⁻ = 1/(N⁻+2)` — the out-of-sample
    * correction that keeps A finite on separable data): each
    * iteration is ONE distributed pass producing the five
    * sufficient sums (gradient + Hessian of a 2-parameter convex
    * objective), a 2×2 driver solve, and an Armijo-backtracked step
    * (≤ 5 loss passes, the [[trainRaw]] L-BFGS discipline). All
    * sums fold through decimal(38,20) — order-independent, so a
    * re-fit returns bit-identical coefficients from any partition
    * layout (the Lloyd M-step lesson). The pass cost is
    * labeled-set-sized: calibration, like training, runs on the
    * curated sample; the 100 TB corpus only ever evaluates the
    * closed-form sigmoid. */
  def calibrate(scored: DataFrame, scoreCol: Column, labelCol: Column,
                iters: Int = 25): (Double, Double) = {
    require(iters >= 1, "iters must be positive")
    val base = scored
      .select(scoreCol.cast("double").as("f"), labelCol.cast("int").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cnt = base.agg(sum(col("y").cast("long")).as("np"),
        count(lit(1)).as("n")).head()
      val nPos = cnt.getLong(0)
      val nNeg = cnt.getLong(1) - nPos
      require(nPos > 0 && nNeg > 0,
        "calibration needs both classes in the labeled frame")
      val tPos = (nPos + 1.0) / (nPos + 2.0)
      val tNeg = 1.0 / (nNeg + 2.0)
      val withT = base.select(col("f"),
        when(col("y") === 1, lit(tPos)).otherwise(lit(tNeg)).as("t"))
      def dsum(c: Column) = sum(c.cast("decimal(38,20)")).cast("double")
      // NLL_i = t·softplus(u) + (1−t)·softplus(−u), u = A·f + B —
      // the stable softplus form the L-BFGS loss pass uses
      def lossAt(a: Double, b: Double): Double = {
        val u = lit(a) * col("f") + lit(b)
        val sp = (uu: Column) => greatest(uu, lit(0.0)) + log1p(exp(-abs(uu)))
        withT.agg(dsum(col("t") * sp(u) +
          (lit(1.0) - col("t")) * sp(-u))).head().getDouble(0)
      }
      var a = 0.0
      var b = math.log((nNeg + 1.0) / (nPos + 1.0)) // Platt's init
      var loss = lossAt(a, b)
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val q = lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("f") + lit(b))))
        val d = q - (lit(1.0) - col("t")) // ∂NLL/∂u per row
        val wgt = q * (lit(1.0) - q)
        val r = withT.agg(
          dsum(d * col("f")).as("ga"), dsum(d).as("gb"),
          dsum(wgt * col("f") * col("f")).as("haa"),
          dsum(wgt * col("f")).as("hab"), dsum(wgt).as("hbb")).head()
        val (ga, gb) = (r.getDouble(0), r.getDouble(1))
        val (haa, hab, hbb) =
          (r.getDouble(2) + 1e-12, r.getDouble(3), r.getDouble(4) + 1e-12)
        if (math.abs(ga) < 1e-10 && math.abs(gb) < 1e-10) converged = true
        else {
          val det = haa * hbb - hab * hab
          val da = (ga * hbb - gb * hab) / det
          val db = (gb * haa - ga * hab) / det
          val gTd = -(ga * da + gb * db) // g·direction for Armijo
          var t = 1.0
          var tries = 0
          var accepted = false
          var bestA = a - da
          var bestB = b - db
          var bestL = lossAt(bestA, bestB)
          while (!accepted && tries < 5) {
            if (bestL <= loss + 1e-4 * t * gTd) accepted = true
            else {
              t /= 2; tries += 1
              bestA = a - t * da; bestB = b - t * db
              bestL = lossAt(bestA, bestB)
            }
          }
          a = bestA; b = bestB; loss = bestL
        }
        it += 1
      }
      (a, b)
    } finally base.unpersist()
  }

  /** Apply [[calibrate]]d coefficients: appends
    * `prob = 1 / (1 + exp(A·score + B))` to a scored frame — one
    * column expression, so the zero-shuffle scoring plan is
    * untouched and the same call gates a stream. */
  def withProbability(scored: DataFrame, a: Double, b: Double): DataFrame =
    scored.withColumn("prob",
      lit(1.0) / (lit(1.0) + exp(lit(a) * col("score") + lit(b))))

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
