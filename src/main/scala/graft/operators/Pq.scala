package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Product quantization for the embedding store — the read-
  * suppression rung BELOW the sign-band/IVF layouts: instead of
  * storing every vector's `dim` floats, split each vector into
  * `numSub` contiguous subvectors, k-means each subspace into
  * `numCodewords` codewords, and store one small integer per
  * subspace. A 64-float (256-byte) embedding becomes 8 codes — the
  * classic ~16–32× store compression (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011, a
  * published method) — and queries rank candidates by ASYMMETRIC
  * distance (exact query vs reconstructed codeword), so search cost
  * and store bytes both drop by the compression factor while recall
  * degrades gracefully with codebook size.
  *
  * Scale contract, piece by piece:
  *  - [[pqCodebooks]] trains on a SAMPLE (like every trainer here:
  *    codebooks are (numSub × numCodewords × dsub) doubles — KB; the
  *    100 TB corpus is what gets ENCODED, never what trains);
  *    k-means runs all subspaces in ONE frame (group keys carry
  *    `sub`), means are order-independent decimal sums (the
  *    [[Similarity.ivfRefreshCentroids]] lesson), and codeword ids
  *    re-rank densely at the end so codes address codebook literals
  *    positionally even after empty clusters drop.
  *  - [[pqEncode]] is ZERO-Exchange scan algebra: the codebook rides
  *    once per plan as [[graft.plans.PlaneExpressions.planeDots]]
  *    codegen references (one per subspace — the hyperplane-hoisting
  *    lesson), argmin is `array_max` over `struct(2·dot − |c|², c)`
  *    — the margin form of min L2 distance, |v_m|² being constant
  *    within a subspace — with ties to the larger code on both the
  *    fused and declarative paths.
  *  - [[pqAdcTopK]] broadcasts the query batch against the coded
  *    corpus; per row the distance is Σ_m (|q_m|² + |c|² − 2·q_m·c)
  *    looked up through ONE nested codebook literal. Ranking is
  *    [[TopK.perGroup]] — never a single-partition window.
  *  - [[annIvfPqTopKFromIndex]] composes with the stored IVF layout:
  *    coarse cosine routing (the layout's own metric) + static
  *    partition pruning exactly as [[Similarity.annIvfTopKFromIndex]],
  *    then ADC instead of exact cosine over the probed clusters —
  *    IVF-PQ, the shape a 10⁹-vector corpus actually serves.
  *
  * Caller contract shared with every ANN operator here: filter
  * null/zero-norm vectors first. Vector length must be a multiple of
  * `numSub`.
  */
object Pq {

  /** Collected codebook: per subspace, the dense-id codeword
    * matrices + derived norms the scan-algebra operators bind into
    * plans. */
  private final case class Book(planes: Seq[Seq[Seq[Double]]],
                                norm2: Seq[Seq[Double]]) {
    def numSub: Int = planes.length
    def dsub: Int = planes.head.head.length
  }

  private def collectBook(codebooks: DataFrame): Book = {
    val rows = codebooks.select(col("sub").cast("int"),
        col("c").cast("int"), col("cv").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    require(rows.nonEmpty, "empty codebook")
    val bySub = rows.groupBy(_._1)
    val subs = bySub.keys.toSeq.sorted
    require(subs == (0 until subs.length),
      s"codebook subspace ids must be dense 0..n-1, got $subs")
    val planes = subs.map(m => bySub(m).map(_._3.toSeq).toSeq)
    // left-fold square sums, matching the declarative replay exactly
    val norm2 = planes.map(_.map(_.foldLeft(0.0)((a, x) => a + x * x)))
    Book(planes, norm2)
  }

  /** One row per (vector, subspace): `(id, sub, sv)` with `sv` the
    * m-th contiguous `dsub`-slice. The train-side shape — encode
    * never explodes. */
  private def subvectors(vecs: DataFrame, idCol: String, vecCol: String,
                         numSub: Int, dsub: Int): DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), explode(transform(
        sequence(lit(0), lit(numSub - 1)),
        m => struct(m.as("sub"),
          slice(col("v"), m * lit(dsub) + 1, lit(dsub)).as("sv")))).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Lloyd M-step over `(sub, c, sv)` members — the (sub, c)-keyed
    * twin of Similarity's: exact decimal sums, so the same member
    * sets give bit-identical codewords from any plan. */
  private def meanStep(members: DataFrame): DataFrame =
    members
      .select(col("sub"), col("c"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub", "c", "pos")
      .agg((sum(col("x").cast("decimal(38,20)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy("sub", "c")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))

  /** Train-side assignment, declarative reference: each `(id, sub)`
    * to its min-L2 codeword of that subspace, ties to the larger
    * code — a broadcast of the KB-sized codebook + a per-key max_by.
    * Retained as the spec reference for [[assignedSubvectors]] (the
    * fused Lloyd E-step): this form materializes corpus × numSub ×
    * numCodewords rows with an INTERPRETED zip_with per row — 90M
    * rows at sf1's 350k × 8 × 32 — where the fused scan emits
    * corpus × numSub rows with the argmin in codegen. */
  private[graft] def assignSubs(cb: DataFrame)(subs: DataFrame): DataFrame =
    subs.join(broadcast(cb.select(col("sub"), col("c"), col("cv"))), "sub")
      .withColumn("__d2", aggregate(
        zip_with(col("sv"), col("cv"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, v) => acc + v))
      .groupBy("id", "sub")
      .agg(max_by(col("c"), struct((-col("__d2")).as("s"), col("c")))
        .as("c"))

  /** The fused Lloyd E-step: ONE zero-Exchange scan emitting
    * `(sub, c, sv)` — code via [[codeExpr]]'s kernel (min L2 ≡ max
    * `2·dot − |c|²` margin, ties to the larger code: the same
    * argmax [[assignSubs]] computes, exactly so under exact
    * arithmetic — spec-pinned on an integer-valued corpus where
    * both formulations are float-exact, including ties), slice
    * alongside it. Replaces assignSubs + the (id, sub) join-back:
    * no corpus × codewords blow-up, no argmax shuffle, no join —
    * the M-step's (sub, c, pos) aggregate is the loop's only
    * Exchange. The codes are let-bound through a one-element-array
    * transform so CollapseProject cannot inline the kernel into
    * each of the numSub output structs (the winnowFingerprints
    * lesson: that would re-run the argmin numSub times per row). */
  private def assignedSubvectors(book: Book, vecs: DataFrame,
                                 vecCol: String): DataFrame = {
    def let(bound: Column, body: Column => Column): Column =
      element_at(transform(array(bound), body), 1)
    val dsub = book.dsub
    vecs.select(explode(let(codeExpr(book, col(vecCol)), codes =>
        transform(sequence(lit(0), lit(book.numSub - 1)), m =>
          struct(m.cast("int").as("sub"),
            element_at(codes, m + 1).as("c"),
            slice(col(vecCol), m * dsub + 1, lit(dsub)).as("sv"))))).as("e"))
      .select(col("e.sub").as("sub"), col("e.c").as("c"),
        col("e.sv").as("sv"))
  }

  /** Per-subspace codebooks `(sub, c, cv)` with DENSE codeword ids
    * 0..k'-1 per subspace (k' ≤ numCodewords after empty clusters
    * drop): a deterministic hash-sample of the corpus' subvectors
    * (same sampled VECTORS in every subspace — the order key is the
    * id) refined by `lloydIters` k-means steps, all subspaces in one
    * frame per pass. Train on a sample at scale; the returned frame
    * is localCheckpoint'ed (KB) for its downstream encode/probe
    * collects.
    *
    * Float caveat (inherited from the fused E-step): assignment uses
    * the `2·dot − |c|²` margin, algebraically the min-L2 argmin but
    * float-exact against it only on integer-valued corpora (the spec
    * corpus). On real float corpora a near-tie Lloyd assignment can
    * flip vs a literal min-L2 trainer — both codebooks are valid
    * k-means fixed-point candidates; downstream encode/probe always
    * uses the SAME margin, so the pipeline is self-consistent. */
  def pqCodebooks(corpus: DataFrame, numSub: Int, numCodewords: Int = 256,
                  lloydIters: Int = 2,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  seedKey: Column => Column = xxhash64(_),
                  dimHint: Option[Int] = None): DataFrame = {
    require(numSub >= 1 && numCodewords >= 1 && lloydIters >= 0)
    // dimHint skips the dedicated one-row probe job when the caller
    // already knows the vector width (opqTrain probes it once per
    // training, not once per alternation) — job-count discipline,
    // r19; the hint changes no arithmetic, only who runs the probe
    val dim = dimHint.getOrElse(
      corpus.select(size(col(vecCol))).head().getInt(0))
    require(dim % numSub == 0,
      s"vector length $dim is not a multiple of numSub=$numSub")
    val dsub = dim / numSub
    val subs = subvectors(corpus, idCol, vecCol, numSub, dsub)
    var cb = TopK.perGroup(
        subs.withColumn("__h", seedKey(col("id"))),
        groups = Seq(col("sub")), order = Seq(col("__h"), col("id")),
        k = numCodewords)
      .select(col("sub"), (col("rnk") - 1).cast("int").as("c"),
        transform(col("sv"), x => x.cast("double")).as("cv"))
      .localCheckpoint(true)
    // dense re-id: Lloyd may drop empty codewords, and both the
    // fused E-step (collectBook addresses positionally) and every
    // scan-algebra consumer need dense 0..k'-1 ids. Applied INSIDE
    // the loop too — the relabel is order-preserving, so a mid-loop
    // tie still resolves to the same codeword VECTOR the original
    // labels would have picked.
    def reId(frame: DataFrame): DataFrame = TopK.perGroup(frame,
        groups = Seq(col("sub")), order = Seq(col("c")),
        k = numCodewords)
      .select(col("sub"), (col("rnk") - 1).cast("int").as("c"), col("cv"))
    (0 until lloydIters).foreach { _ =>
      val prev = cb
      // fused E-step: one scan, no corpus × codewords blow-up, no
      // argmax shuffle, no join-back (see assignedSubvectors)
      val asg = assignedSubvectors(collectBook(prev), corpus, vecCol)
      cb = reId(meanStep(asg)).localCheckpoint(true)
      org.apache.spark.sql.graft.CheckpointBridge.unpersist(prev)
    }
    cb
  }

  /** The code array for one vector column — the scan-algebra body
    * shared by [[pqEncode]] and [[pqEncodeResiduals]]: the fused
    * [[graft.plans.PqCodes]] kernel (codebook + norms as codegen
    * reference objects, argmin as the `2·dot − |c|²` margin with
    * ties to the larger code — |v_m|² is constant within a subspace,
    * so it cancels from the comparison). The declarative
    * planeDots/array_max chain it replaced ran the argmax lambdas
    * INTERPRETED and carried the norm arrays as plan literals;
    * [[codeExprHof]] keeps it as the raw-codes spec reference. */
  private def codeExpr(book: Book, vec: Column): Column =
    graft.plans.AdcExpressions.pqCodes(vec, book.planes, book.norm2)

  /** The declarative encode chain — one
    * [[graft.plans.PlaneExpressions.planeDots]] reference per
    * subspace, argmin via `transform`/`array_max` — retained as the
    * bit-identity spec reference for [[codeExpr]]'s fused kernel
    * (the `adcScoreHof` role), edge cases included. */
  private[graft] def codeExprHof(book: Book, vec: Column): Column = {
    val dsub = book.dsub
    array((0 until book.numSub).map { m =>
      val cn2 = typedLit(book.norm2(m))
      val dots = graft.plans.PlaneExpressions.planeDots(
        slice(vec, m * dsub + 1, dsub), book.planes(m))
      array_max(transform(dots, (d, j) =>
        struct((d * 2 - element_at(cn2, j + 1)).as("s"), j.as("c"))))
        .getField("c")
    }: _*)
  }

  /** Spec seam: [[pqEncode]] through the declarative chain. */
  private[graft] def pqEncodeHof(vecs: DataFrame, codebooks: DataFrame,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding"): DataFrame =
    vecs.select(col(idCol), codeExprHof(collectBook(codebooks), col(vecCol))
      .as("code"))

  /** Encode every vector to its `numSub` codes — `(idCol, code)`
    * with `code(m)` the dense id of subspace m's nearest codeword
    * (min L2, ties to the larger id). ZERO Exchange ([[codeExpr]]).
    * Runs unchanged on a stream, like every scan-algebra gate
    * here. */
  def pqEncode(vecs: DataFrame, codebooks: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    vecs.select(col(idCol), codeExpr(collectBook(codebooks), col(vecCol))
      .as("code"))

  /** Residual rows of an inverted file: `(c_id, n_id, rv)` with
    * `rv = ec − centroid(c_id)` — what RESIDUAL PQ quantizes.
    * After coarse assignment the per-cluster mean is already
    * explained by the centroid, so the residual field has strictly
    * less energy than the raw vectors and the SAME codebook budget
    * buys a finer quantization (Jégou et al. 2011 §IV: IVFADC
    * encodes residuals, not raw vectors). The centroid frame is
    * KB-sized and broadcasts; the subtraction is one `zip_with`
    * projection — no data-sized movement beyond the scan. The
    * centroid side is cast to the store's `c_id` type so a
    * partitionBy-read store (int directory values) joins without
    * widening the store column. */
  def residualAssignments(assignments: DataFrame,
                          coarseCentroids: DataFrame): DataFrame = {
    val storeKeyType = assignments.schema("c_id").dataType
    assignments.select(col("c_id"), col("n_id"), col("ec"))
      .join(broadcast(coarseCentroids.select(
        col("c_id").cast(storeKeyType).as("c_id"), col("cv"))), "c_id")
      .select(col("c_id"), col("n_id"),
        zip_with(col("ec"), col("cv"),
          (a, b) => a.cast("double") - b).as("rv"))
  }

  /** Residual-encode an inverted file: `(c_id, n_id, code)` with
    * `code` the PQ codes of `ec − centroid(c_id)` under `codebooks`
    * (trained on [[residualAssignments]] rows). The coded store an
    * IVF-PQ serving layout actually persists — reconstruction is
    * `centroid + codeword concat`, so the coarse and fine layers
    * SHARE the bit budget instead of the fine layer re-spending bits
    * on cluster means. Same scan-algebra plan as [[pqEncode]] plus
    * one broadcast of the KB-sized centroids: zero shuffle, runs
    * unchanged on a stream. */
  def pqEncodeResiduals(assignments: DataFrame, coarseCentroids: DataFrame,
                        codebooks: DataFrame): DataFrame =
    residualAssignments(assignments, coarseCentroids)
      .select(col("c_id"), col("n_id"),
        codeExpr(collectBook(codebooks), col("rv")).as("code"))

  /** Reconstruct coded vectors — `(idCol, vec array<double>)`, the
    * concatenation of each code's codeword. The decode half of the
    * [[pqEncode]] pair; specs replay ADC distances through it. */
  def pqDecode(codes: DataFrame, codebooks: DataFrame,
               idCol: String = "vec_id"): DataFrame = {
    val book = collectBook(codebooks)
    val cb3 = typedLit(book.planes)
    codes.select(col(idCol),
      flatten(transform(col("code"), (c, m) =>
        element_at(element_at(cb3, m + 1), c + 1))).as("vec"))
  }

  /** Asymmetric-distance top-k: each query (exact floats) against
    * the coded corpus. `dist` is the FULL squared L2 distance to the
    * reconstruction (|q_m|² included via |q|²), ranked ascending
    * with `n_id` ties, through the two-phase [[TopK.perGroup]].
    * Query side broadcasts — the serving contract, as
    * [[Similarity.annIvfTopKFromIndex]]. Self-matches (same id) are
    * excluded. A code array whose length differs from the codebook
    * count scores NULL (all three ADC paths agree), and ascending
    * rank puts NULLS FIRST — store corruption surfaces as a
    * null-distance rank-1 row, loud at the top of the result,
    * never as a spuriously-near plausible neighbor (spec-pinned). */
  def pqAdcTopK(codebooks: DataFrame, codes: DataFrame,
                queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val rows = codes
      .select(col(idCol).as("n_id"), col("code"))
      .crossJoin(broadcast(
        queries.select(col(idCol).as("q_id"), col(vecCol).as("eq"))))
    val scored = adcScore(collectBook(codebooks), rows)
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("dist").asc, col("n_id").asc), k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** ADC top-k via PER-QUERY PRECOMPUTED DISTANCE TABLES (Jégou et
    * al. 2011 §V: the standard serving optimization): each query
    * computes `T[m][c] = |q_m − codeword_{m,c}|²` ONCE
    * (numSub × numCodewords doubles), and every candidate's distance
    * is then `numSub` table LOOKUPS per (query, row) pair — not
    * `numSub · dsub` multiply-adds through the nested codebook
    * literal. The tables broadcast (queries × numSub × numCodewords
    * doubles — MBs at serving-sized query batches) and the scan is
    * one `mapPartitions`: the documented last-resort path, justified
    * because a per-query lookup table is not expressible as one
    * Catalyst expression without embedding per-query literals (plan
    * size O(queries × table) — the exact growth the plane-matrix
    * binding lesson exists to prevent). Distances agree with
    * [[pqAdcTopK]] to float rounding (this form sums |q_m − c|²
    * directly; the literal form expands |q|² + Σ(|c|² − 2·q_m·c));
    * the spec pins rank-for-rank agreement on the real corpus and
    * measures the crossover at a 16×256 serving-budget codebook. */
  def pqAdcTopKTabulated(codebooks: DataFrame, codes: DataFrame,
                         queries: DataFrame, k: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val book = collectBook(codebooks)
    val dsub = book.dsub
    val cw: Array[Array[Array[Double]]] =
      book.planes.map(_.map(_.toArray).toArray).toArray
    val qRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    require(qRows.nonEmpty, "no query vectors")
    val tables: Array[(Long, Array[Array[Double]])] = qRows.map {
      case (qid, q) => (qid, distTable(cw, dsub, q))
    }
    val bc = spark.sparkContext.broadcast(tables)
    val scored = codes
      .select(col(idCol).cast("long").as("n_id"), col("code"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nId, code) =>
          qs.iterator.collect { case (qid, t) if qid != nId =>
            // the AdcSum length guard, mirrored: a truncated or
            // over-long code is a null distance, never a partial sum
            if (code.length != t.length) (qid, nId, Option.empty[Double])
            else {
              var s = 0.0
              var m = 0
              while (m < code.length) { s += t(m)(code(m)); m += 1 }
              (qid, nId, Some(s))
            }
          }
        }
      }.toDF("q_id", "n_id", "dist")
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("dist").asc, col("n_id").asc), k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** `T[m][c] = |q_m − codeword_{m,c}|²` for one query vector. */
  private def distTable(cw: Array[Array[Array[Double]]], dsub: Int,
                        q: Array[Double]): Array[Array[Double]] =
    Array.tabulate(cw.length) { m =>
      Array.tabulate(cw(m).length) { c =>
        val w = cw(m)(c)
        var s = 0.0
        var p = 0
        while (p < dsub) {
          val d = q(m * dsub + p) - w(p); s += d * d; p += 1
        }
        s
      }
    }

  /** Tabulated ADC over probed store rows, shared by the two
    * `tabulated = true` probe paths: `probes` carries one (cluster,
    * query, query-vector) triple per probe — for the raw probe the
    * vector (and so the table) repeats per cluster; the residual
    * probe's genuinely varies — and the scan resolves each store
    * row's probing queries from a broadcast cluster→tables map, so
    * the mapPartitions subsumes the broadcast join AND the ADC
    * lookup in one pass. */
  private def adcScoreTabulated(cw: Array[Array[Array[Double]]], dsub: Int,
                                rows: DataFrame,
                                probes: Seq[(Long, Long, Array[Double])])
      : DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val tables: Map[Long, Array[(Long, Array[Array[Double]])]] = probes
      .map { case (cid, qid, q) => (cid, qid, distTable(cw, dsub, q)) }
      .groupBy(_._1)
      .map { case (cid, ts) => cid -> ts.map(t => (t._2, t._3)).toArray }
    val bc = spark.sparkContext.broadcast(tables)
    rows.as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val byCluster = bc.value
        it.flatMap { case (cid, nId, code) =>
          byCluster.getOrElse(cid, Array.empty).iterator.collect {
            case (qid, t) if qid != nId =>
              if (code.length != t.length) (qid, nId, Option.empty[Double])
              else {
                var s = 0.0
                var m = 0
                while (m < code.length) { s += t(m)(code(m)); m += 1 }
                (qid, nId, Some(s))
              }
          }
        }
      }.toDF("q_id", "n_id", "dist")
  }

  /** The ADC scoring body shared by [[pqAdcTopK]] and the IVF-PQ
    * probe: `rows` carries already-paired `(n_id, code, q_id, eq)`;
    * the distance runs through the FUSED [[graft.plans.AdcSum]]
    * kernel (codebook + norms as codegen reference objects — the
    * declarative HOF chain evaluates interpreted and measured 1.9×
    * the full-vector probe it exists to beat,
    * bench_store_sf1_pq_x40.json; the fused form is the PlaneDots
    * discipline applied to ADC). Self-matches are excluded here,
    * once. [[adcScoreHof]] keeps the declarative chain as the
    * bit-identical spec reference. */
  private def adcScore(book: Book, rows: DataFrame): DataFrame =
    rows
      .where(col("n_id") =!= col("q_id"))
      .withColumn("__qn2", VectorFns.dot(col("eq"), col("eq")))
      .withColumn("dist",
        col("__qn2") + graft.plans.AdcExpressions.adcSum(
          col("eq"), col("code"), book.planes, book.norm2))
      .select(col("q_id"), col("n_id"), col("dist"))

  /** The declarative ADC chain — `aggregate`/`transform` over one
    * nested codebook literal — retained as the raw-bits spec
    * reference for [[adcScore]]'s fused kernel (the `dotHof`
    * role). Mirrors the fused kernel's length guard: a code array
    * whose length differs from the codebook count nulls the
    * distance (a partial Σ would rank spuriously near). */
  private[graft] def adcScoreHof(book: Book, rows: DataFrame): DataFrame = {
    val dsub = book.dsub
    val cb3 = typedLit(book.planes)
    val cn2 = typedLit(book.norm2)
    rows
      .where(col("n_id") =!= col("q_id"))
      .withColumn("__qn2", VectorFns.dot(col("eq"), col("eq")))
      .withColumn("dist", when(size(col("code")) === book.numSub,
        col("__qn2") + aggregate(
          transform(col("code"), (c, m) =>
            element_at(element_at(cn2, m + 1), c + 1) -
              lit(2.0) * aggregate(
                sequence(lit(0), lit(dsub - 1)), lit(0.0),
                (acc, p) => acc +
                  element_at(col("eq"), m * dsub + p + 1).cast("double") *
                  element_at(element_at(element_at(cb3, m + 1), c + 1),
                    p + 1))),
          lit(0.0), (acc, v) => acc + v)))
      .select(col("q_id"), col("n_id"), col("dist"))
  }

  /** Spec seam: brute ADC through the declarative chain, same
    * surface as [[pqAdcTopK]]. */
  private[graft] def pqAdcTopKHof(codebooks: DataFrame, codes: DataFrame,
                                  queries: DataFrame, k: Int,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding")
      : DataFrame = {
    val rows = codes
      .select(col(idCol).as("n_id"), col("code"))
      .crossJoin(broadcast(
        queries.select(col(idCol).as("q_id"), col(vecCol).as("eq"))))
    val scored = adcScoreHof(collectBook(codebooks), rows)
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("dist").asc, col("n_id").asc), k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** IVF-PQ probe over a STORED coded layout: queries route to their
    * `nProbe` nearest coarse centroids (cosine — the IVF layout's
    * own metric, [[Similarity.annIvfTopKFromIndex]]'s exact routing
    * including the static `isin` partition pruning), then rank the
    * probed clusters' rows by ADC. `codedAssignments` is an
    * [[Similarity.ivfAssignments]] frame whose `(ec, nc)` payload
    * was replaced by [[pqEncode]] codes — |corpus|·nProbe/k rows
    * read at ~numSub bytes each instead of dim floats: the two
    * read-suppression rungs multiply. `tabulated = true` swaps the
    * literal-lookup distance for [[adcScoreTabulated]]'s precomputed
    * tables (the measured 7× at serving-budget codebooks — PqSpec),
    * same ranks; both probe forms accept it. For unit-normalized
    * embeddings cosine routing and the ADC's L2 ranking order agree;
    * mixed-norm corpora should normalize before encoding (standard
    * PQ practice). */
  def annIvfPqTopKFromIndex(coarseCentroids: DataFrame,
                            codedAssignments: DataFrame,
                            codebooks: DataFrame,
                            queries: DataFrame, nProbe: Int, k: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            tabulated: Boolean = false): DataFrame = {
    require(nProbe >= 1, "nProbe must be positive")
    val storeKeyType = codedAssignments.schema("c_id").dataType
    val queryProbes = Similarity.assignTo(coarseCentroids)(
        queries, idCol, vecCol, keep = nProbe)
      .join(queries.select(col(idCol).as("__id"), col(vecCol).as("eq")),
        "__id")
      .select(col("__id").as("q_id"),
        col("c_id").cast(storeKeyType).as("c_id"), col("eq"))
    val probedIds = queryProbes.select(col("c_id")).distinct()
      .collect().map(_.get(0)).toSeq
    val probedRows = codedAssignments.select("c_id", "n_id", "code")
      .where(col("c_id").isin(probedIds: _*))
    // a stored vector lives in exactly ONE cluster directory and a
    // query probes distinct clusters, so (q_id, n_id) pairs never
    // duplicate — no dedup pass, unlike multi-table LSH probing
    val book = collectBook(codebooks)
    val scored =
      if (tabulated) adcScoreTabulated(
        book.planes.map(_.map(_.toArray).toArray).toArray, book.dsub,
        probedRows.select(col("c_id").cast("long"),
          col("n_id").cast("long"), col("code")),
        collectProbes(queryProbes))
      else adcScore(book,
        probedRows.join(broadcast(queryProbes), Seq("c_id"))
          .select(col("n_id"), col("code"), col("q_id"), col("eq")))
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("dist").asc, col("n_id").asc), k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** Driver copy of a probe frame for the tabulated path — one
    * (cluster, query, vector) triple per probe; queries × nProbe
    * rows, the serving contract's small side. */
  private def collectProbes(queryProbes: DataFrame)
      : Seq[(Long, Long, Array[Double])] = {
    val spark = queryProbes.sparkSession
    import spark.implicits._
    queryProbes.select(col("c_id").cast("long"), col("q_id").cast("long"),
        col("eq").cast("array<double>"))
      .as[(Long, Long, Array[Double])].collect().toSeq
  }

  /** IVF-PQ probe over a RESIDUAL-coded store (IVFADC proper, Jégou
    * et al. 2011 §IV): routing and static partition pruning exactly
    * as [[annIvfPqTopKFromIndex]], but `codedAssignments` carries
    * [[pqEncodeResiduals]] codes, so the ADC "query vector" inside a
    * probed cluster is the query RESIDUAL `q − centroid(c)` — the
    * distance is |q − (centroid + codeword concat)|², the exact L2
    * to the two-layer reconstruction. The residual varies per
    * (query, probed cluster), which is why it's computed at probe
    * time from the broadcast centroid frame (numerically free: one
    * `zip_with` over an nProbe×|queries|-row broadcast side) — the
    * stored side still reads ~numSub small ints per vector. Same
    * serving contract: query batch broadcasts, store never
    * shuffles. */
  def annIvfPqResidualTopKFromIndex(coarseCentroids: DataFrame,
                                    codedAssignments: DataFrame,
                                    codebooks: DataFrame,
                                    queries: DataFrame, nProbe: Int, k: Int,
                                    idCol: String = "vec_id",
                                    vecCol: String = "embedding",
                                    tabulated: Boolean = false)
      : DataFrame = {
    require(nProbe >= 1, "nProbe must be positive")
    val storeKeyType = codedAssignments.schema("c_id").dataType
    val queryProbes = Similarity.assignTo(coarseCentroids)(
        queries, idCol, vecCol, keep = nProbe)
      .join(queries.select(col(idCol).as("__id"), col(vecCol).as("eq")),
        "__id")
      .join(broadcast(coarseCentroids.select(col("c_id"), col("cv"))),
        "c_id")
      .select(col("__id").as("q_id"),
        col("c_id").cast(storeKeyType).as("c_id"),
        zip_with(col("eq"), col("cv"),
          (a, b) => a.cast("double") - b).as("eq"))
    val probedIds = queryProbes.select(col("c_id")).distinct()
      .collect().map(_.get(0)).toSeq
    val probedRows = codedAssignments.select("c_id", "n_id", "code")
      .where(col("c_id").isin(probedIds: _*))
    val book = collectBook(codebooks)
    val scored =
      if (tabulated) adcScoreTabulated(
        book.planes.map(_.map(_.toArray).toArray).toArray, book.dsub,
        probedRows.select(col("c_id").cast("long"),
          col("n_id").cast("long"), col("code")),
        collectProbes(queryProbes))
      else adcScore(book,
        probedRows.join(broadcast(queryProbes), Seq("c_id"))
          .select(col("n_id"), col("code"), col("q_id"), col("eq")))
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("dist").asc, col("n_id").asc), k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** Serve top-k from a PERSISTED index ([[graft.io.PqIndexStore]]):
    * rotate the query batch through the stored R (when the index is
    * OPQ), route through the stored coarse centroids (when it is
    * IVF-laid-out, with the same static partition pruning as
    * [[annIvfPqTopKFromIndex]]; residual-coded stores dispatch to
    * the IVFADC probe — the artifact's own `_RESIDUAL_CODES` marker
    * decides, never a caller convention), and ADC-rank the probed
    * codes — TRAINING NEVER RUNS HERE. This is the serving contract the
    * in-surface probes only approximate: their per-call retraining
    * is a corpus pass that grows with volume (the measured ~3×
    * sf1 scaling of the OPQ/IVF-PQ probe surfaces), while this path
    * reads KBs of artifact plus the probed partitions. Results are
    * bit-identical to the in-memory probe over the frames the index
    * was written from (doubles round-trip parquet exactly;
    * spec-pinned through a real store). */
  def annTopKFromStoredIndex(index: graft.io.PqIndexStore.PqIndex,
                             queries: DataFrame, nProbe: Int, k: Int,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             tabulated: Boolean = false): DataFrame = {
    val q = index.rotation match {
      case Some(rot) => rotate(queries, rot, idCol, vecCol)
      case None => queries
    }
    index.centroids match {
      case Some(cents) if index.residual =>
        annIvfPqResidualTopKFromIndex(cents, index.codes, index.codebooks,
          q, nProbe, k, idCol, vecCol, tabulated)
      case Some(cents) =>
        annIvfPqTopKFromIndex(cents, index.codes, index.codebooks,
          q, nProbe, k, idCol, vecCol, tabulated)
      case None =>
        if (tabulated)
          pqAdcTopKTabulated(index.codebooks, index.codes, q, k,
            idCol, vecCol)
        else pqAdcTopK(index.codebooks, index.codes, q, k, idCol, vecCol)
    }
  }

  /** Code a fresh batch IN THE INDEX'S OWN LAYOUT — the encode half
    * of [[graft.io.PqIndexStore.appendCodes]]'s daily-ingest cycle:
    * rotate through the stored R (if OPQ), route through the stored
    * centroids (if IVF-laid-out), quantize raw vectors or residuals
    * per the store's own residual marker. Because every artifact is
    * FROZEN, encoding is pointwise and an appended store serves
    * exactly what a rebuilt one would over the union (spec-pinned) —
    * the q73 incremental-IVF identity lifted to coded stores. */
  def encodeForIndex(index: graft.io.PqIndexStore.PqIndex,
                     vecs: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = index.rotation match {
      case Some(rot) => rotate(vecs, rot, idCol, vecCol)
      case None => vecs
    }
    index.centroids match {
      case Some(cents) if index.residual =>
        pqEncodeResiduals(
          Similarity.ivfAssignments(v, cents, idCol, vecCol),
          cents, index.codebooks)
      case Some(cents) =>
        Similarity.ivfAssignments(v, cents, idCol, vecCol)
          .select("c_id", "n_id")
          .join(pqEncode(v, index.codebooks, idCol, vecCol)
            .withColumnRenamed(idCol, "n_id"), "n_id")
      case None =>
        pqEncode(v, index.codebooks, idCol, vecCol)
    }
  }

  /** OPQ rotation MAINTENANCE — the [[Similarity.ivfRefreshCentroids]]
    * analog for the learned rotation: as batches accumulate in a
    * coded store, the R that was optimal for the training snapshot
    * drifts off the corpus it now serves. Re-fit it FROM THE STORE'S
    * OWN CODES: decode each stored code to its reconstruction y (in
    * the rotated space), take `M = Σ y·xᵀ` against the current
    * original vectors x, and Procrustes M — exactly the alternation
    * step [[opqTrain]] runs, with the stored codes standing in for
    * the in-flight encode. Because M absorbs the old rotation
    * entirely (y lives in rotated space, x in the original), the
    * refit needs no access to the R being replaced.
    *
    * Warm-start identity (spec-pinned through a store round-trip):
    * refitting from a day-1 store equals the rotation one more
    * [[opqTrain]] alternation would have produced — integer codes +
    * exact-decimal M + deterministic Jacobi SVD leave no float
    * divergence surface. Cost: one corpus-pass [[crossCorrelation]]
    * (d×d buffer per partition) + a driver d×d SVD; the re-encode
    * under the new R is the caller's [[opqEncode]] call, priced by
    * the StoreBench opq arm. */
  def opqRefreshRotation(corpus: DataFrame, codes: DataFrame,
                         codebooks: DataFrame,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding")
      : Seq[Seq[Double]] = {
    val dimProbe = corpus.select(size(col(vecCol))).head(1)
    require(dimProbe.nonEmpty, "opqRefreshRotation: empty corpus")
    val dim = dimProbe.head.getInt(0)
    val recon = pqDecode(codes, codebooks, idCol)
    val m = crossCorrelation(corpus, recon, dim, idCol, vecCol)
    procrustes(m).map(_.toSeq).toSeq
  }

  // -----------------------------------------------------------------
  // Optimized Product Quantization (Ge et al., "Optimized Product
  // Quantization for Approximate Nearest Neighbor Search", CVPR 2013
  // — a published method; the non-parametric variant, also Norouzi &
  // Fleet's Cartesian k-means, CVPR 2013): learn an ORTHOGONAL
  // rotation R jointly with the codebooks so that R·x quantizes
  // better than x — raw PQ's subspaces are an arbitrary slicing of
  // the dimension order, and when variance is unevenly spread (or
  // correlated across the slice boundaries) some subspaces starve
  // while others waste their codeword budget. The alternation:
  //   (1) train/encode in the current rotated space,
  //   (2) orthogonal Procrustes: R = U·Vᵀ from SVD(Σ y·xᵀ), y the
  //       reconstruction of R·x — the closed-form argmin of
  //       Σ|R·x − y|² over orthogonal R.
  // Because R is orthogonal, distances in the rotated space ARE
  // distances in the original space: search = rotate the query, then
  // every existing ADC/IVF-PQ path applies unchanged.

  /** Apply a rotation to a vector column — `R·x` as ONE
    * [[graft.plans.PlaneExpressions.planeDots]] reference (R's rows
    * are the planes): the matrix rides the plan once as a codegen
    * reference object, zero Exchange, runs unchanged on a stream.
    * Orthogonality makes it norm-preserving, so downstream cosine /
    * L2 semantics are untouched. */
  def rotate(vecs: DataFrame, rotation: Seq[Seq[Double]],
             idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    vecs.withColumn(vecCol,
      graft.plans.PlaneExpressions.planeDots(col(vecCol), rotation))

  /** Non-parametric OPQ training: `(rotation, codebooks)` after
    * `opqIters` alternations starting from the identity rotation.
    * The returned codebooks quantize ROTATED vectors — encode with
    * [[opqEncode]] (or `pqEncode(rotate(...))`), search by rotating
    * the query first.
    *
    * Distribution contract: train on a SAMPLE, like [[pqCodebooks]]
    * (rotation + codebooks are KBs; the corpus is what gets encoded).
    * Per alternation the only data-sized work is one codebook
    * training pass and one reconstruction-correlation aggregate
    * `M = Σ y·xᵀ` — one [[graft.plans.OuterProductSum]] d×d buffer
    * per partition with exact DECIMAL terms, so M (and hence the
    * whole training) is bit-identical under any partitioning and the
    * scan never materializes corpus × d² rows. The d×d SVD runs on
    * the driver (d ≤ a few hundred for embedding columns —
    * microseconds; the distributed half is the corpus pass, never
    * the SVD). */
  def opqTrain(corpus: DataFrame, numSub: Int, numCodewords: Int = 256,
               opqIters: Int = 3, lloydIters: Int = 1,
               idCol: String = "vec_id", vecCol: String = "embedding",
               seedKey: Column => Column = xxhash64(_),
               initRotation: Option[Seq[Seq[Double]]] = None)
      : (Seq[Seq[Double]], DataFrame) = {
    require(opqIters >= 1, "at least one alternation")
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % numSub == 0,
      s"vector length $dim is not a multiple of numSub=$numSub")
    var rot: Seq[Seq[Double]] = initRotation.getOrElse(
      Seq.tabulate(dim)(i => Seq.tabulate(dim)(j => if (i == j) 1.0 else 0.0)))
    require(rot.length == dim && rot.forall(_.length == dim),
      "initRotation must be dim x dim")
    var cb: DataFrame = null
    (0 until opqIters).foreach { it =>
      val rx = rotate(corpus, rot, idCol, vecCol)
      val prev = cb
      cb = pqCodebooks(rx, numSub, numCodewords, lloydIters,
        idCol, vecCol, seedKey, dimHint = Some(dim))
      if (prev != null)
        org.apache.spark.sql.graft.CheckpointBridge.unpersist(prev)
      if (it < opqIters - 1) {
        val recon = pqDecode(pqEncode(rx, cb, idCol, vecCol), cb, idCol)
        val m = crossCorrelation(corpus, recon, dim, idCol, vecCol)
        rot = procrustes(m).map(_.toSeq).toSeq
      }
    }
    (rot, cb)
  }

  /** Encode under a learned rotation: codes of `R·x`. Same
    * zero-Exchange scan algebra as [[pqEncode]] — the rotation adds
    * one plane-dots projection to the same plan. */
  def opqEncode(vecs: DataFrame, rotation: Seq[Seq[Double]],
                codebooks: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    pqEncode(rotate(vecs, rotation, idCol, vecCol), codebooks, idCol, vecCol)

  /** Parametric OPQ init (Ge et al. 2013 §4.2, eigenvalue
    * allocation): rotate into the data's PCA basis, with principal
    * directions GROUPED into subspaces so the per-subspace variance
    * products balance — the closed-form optimum for Gaussian data,
    * and the warm start the paper recommends before non-parametric
    * refinement ([[opqTrain]]'s `initRotation`). Without it, NP-OPQ
    * has a fixed point at the identity on axis-aligned independent
    * dims (M = Σ y·xᵀ comes out symmetric positive → Procrustes
    * returns I) — the exact case where raw PQ is worst.
    *
    * Distributed work is one second-moment pass through the
    * [[graft.plans.OuterProductSum]] buffer (one exact-decimal d×d
    * buffer per partition, like the Procrustes cross-correlation —
    * never corpus × d² exploded rows); the d×d symmetric
    * eigendecomposition runs on the driver. Allocation is the paper's greedy balance: eigen-
    * directions in descending-variance order, each to the unfilled
    * subspace with the smallest log-variance product. */
  def eigenAllocationInit(corpus: DataFrame, numSub: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): Seq[Seq[Double]] = {
    // TWO actions, not four (r19 — the family is job-count-bound:
    // every extra driver action costs a full plan/schedule round
    // trip, ~40% of the probe queries' wall at sf0.1):
    //  1. one agg returns the second moment AND the row count n —
    //     exactly the old count() over the same frame;
    //  2. one per-index aggregate returns the EXACT decimal sums —
    //     dim falls out as the row count of the result, and the
    //     means divide locally by the same n as before (decimal
    //     addition is associative, so the sums — and every derived
    //     IEEE value — are bit-identical to the old shape).
    // The old dedicated head(dim) and count() jobs are gone.
    val base = corpus.select(
      transform(col(vecCol), x => x.cast("double")).as("x"))
    // second moment Σ x·xᵀ through the buffered outer-product
    // aggregate (one d×d buffer per partition) — never corpus × d²
    // exploded rows; exact-decimal terms as the sums below, so the
    // covariance is order-independent under any partitioning
    val momRow = base
      .agg(graft.plans.MomentAggregates
        .outerProductSum(col("x"), col("x")).as("m"),
        count(lit(1)).as("n"))
      .head()
    val n = momRow.getLong(1).toDouble
    require(n > 0, "eigenAllocationInit: empty training corpus")
    val sumRows = base
      .select(posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast("decimal(38,18)")).as("s"))
      .collect()
    val dim = sumRows.length
    require(dim > 0,
      "eigenAllocationInit: empty training corpus (no vectors to " +
        "estimate a covariance from)")
    require(dim % numSub == 0,
      s"vector length $dim is not a multiple of numSub=$numSub")
    val dsub = dim / numSub
    val mean = Array.ofDim[Double](dim)
    sumRows.foreach(r => mean(r.getInt(0)) =
      (r.getDecimal(1).doubleValue / n))
    val mom = momRow.getSeq[scala.collection.Seq[Double]](0)
    require(mom.length == dim && mom.forall(_.length == dim),
      s"moment matrix came back ${mom.length}-dim, want $dim")
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim)
      cov(i)(j) = mom(i)(j) / n - mean(i) * mean(j)
    val (vals, vecsM) = symmetricEigen(cov)
    // Balance Σ log λ per subspace (equal variance PRODUCTS — the
    // paper's criterion). The greedy as usually stated ("descending
    // λ to the subspace with the smallest current product") is
    // DEGENERATE whenever all λ < 1: every assignment SHRINKS the
    // product, so the first bucket attracts every following λ until
    // full — reproducing exactly the natural slicing it exists to
    // fix (found by running the spec: 2.6% gain instead of the
    // expected multiples). Sign-aware LPT instead: jobs log λ in
    // descending |log λ|, each to the unfilled subspace whose
    // running sum is extreme in the OPPOSITE direction — the
    // multiway-partition heuristic the original greedy degenerates
    // from, stated so it survives spectra on either side of 1.
    val logs = Array.fill(numSub)(0.0)
    val fill = Array.fill(numSub)(0)
    val assign = Array.fill(numSub)(List.empty[Int])
    val jobs = vals.indices
      .map(e => (e, math.log(math.max(vals(e), 1e-300))))
      .sortBy { case (e, v) => (-math.abs(v), e) }
    jobs.foreach { case (e, v) =>
      val open = (0 until numSub).filter(b => fill(b) < dsub)
      val b = if (v < 0) open.maxBy(bb => (logs(bb), -bb))
              else open.minBy(bb => (logs(bb), bb))
      assign(b) = assign(b) :+ e
      fill(b) += 1
      logs(b) += v
    }
    // R rows: subspace b's assigned eigenvectors, in assignment order
    (0 until numSub).flatMap(b => assign(b))
      .map(e => Seq.tabulate(dim)(i => vecsM(i)(e)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * `(eigenvalues, eigenvectors)` with eigenvector k in COLUMN k.
    * Driver math on d×d, deterministic. */
  private[graft] def symmetricEigen(m0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = Array.tabulate(d)(i => m0(i).clone())
    val v = Array.tabulate(d)(i => Array.tabulate(d)(j =>
      if (i == j) 1.0 else 0.0))
    var sweep = 0
    var off = 1.0
    while (off > 1e-24 && sweep < 60) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15 *
              math.sqrt(math.abs(a(p)(p) * a(q)(q)) + 1e-300)) {
            val zeta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(zeta) /
              (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** `M[i][j] = Σ_rows y_i · x_j` — the reconstruction↔original
    * cross-correlation the Procrustes step decomposes. Runs through
    * [[graft.plans.OuterProductSum]]: one d×d exact-decimal buffer
    * per partition and a buffer-sized merge, never the corpus × d²
    * exploded rows of the (i,j)-keyed formulation (4,096× per vector
    * at d = 64 — the blow-up that made "train on a SAMPLE" a
    * numerics contract AND a cost ceiling; now it is only the
    * former). Exact decimal terms keep every entry order-independent
    * — bit-identical M from any partitioning, and bit-identical to
    * the exploded reference ([[crossCorrelationExploded]],
    * spec-pinned). */
  private def crossCorrelation(corpus: DataFrame, recon: DataFrame,
                               dim: Int, idCol: String, vecCol: String)
      : Array[Array[Double]] = {
    val joined = corpus
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("x"))
      .join(recon.select(col(idCol).as("id"), col("vec").as("y")), "id")
    val m = joined
      .agg(graft.plans.MomentAggregates
        .outerProductSum(col("y"), col("x")).as("m"))
      .head().getSeq[scala.collection.Seq[Double]](0)
    require(m.length == dim && m.forall(_.length == dim),
      s"cross-correlation came back ${m.length}-dim, want $dim")
    m.map(_.toArray).toArray
  }

  /** The exploded (i,j)-keyed decimal formulation of
    * [[crossCorrelation]] — retained as the bit-identity spec
    * reference for the buffered aggregate (the `adcScoreHof`
    * role). */
  private[graft] def crossCorrelationExploded(corpus: DataFrame,
                                              recon: DataFrame, dim: Int,
                                              idCol: String, vecCol: String)
      : Array[Array[Double]] = {
    val joined = corpus
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("x"))
      .join(recon.select(col(idCol).as("id"), col("vec").as("y")), "id")
    val entries = joined
      .select(posexplode(col("y")).as(Seq("i", "yi")), col("x"))
      .select(col("i"), posexplode(
        transform(col("x"), xj => col("yi") * xj)).as(Seq("j", "p")))
      .groupBy("i", "j")
      .agg(sum(col("p").cast("decimal(38,18)")).cast("double").as("m"))
      .collect()
    val m = Array.ofDim[Double](dim, dim)
    entries.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    m
  }

  /** Orthogonal Procrustes solution `R = U·Vᵀ` for `SVD(M) = U·S·Vᵀ`
    * — the rotation maximizing `tr(R·Mᵀ)`, i.e. minimizing
    * `Σ|R·x − y|²` for `M = Σ y·xᵀ`. One-sided Jacobi SVD: right
    * rotations orthogonalize M's columns (accumulated into V); the
    * surviving column directions are U's columns; near-null columns
    * (rank-deficient M) are completed to an orthonormal basis from
    * identity candidates, keeping R a true rotation of the whole
    * space. Pure driver math on a d×d matrix — deterministic, no
    * library dependency. */
  private[graft] def procrustes(m0: Array[Array[Double]])
      : Array[Array[Double]] = {
    val d = m0.length
    // column-major working copy a(j) = column j of M
    val a = Array.tabulate(d)(j => Array.tabulate(d)(i => m0(i)(j)))
    val v = Array.tabulate(d)(j => Array.tabulate(d)(i =>
      if (i == j) 1.0 else 0.0))
    val eps = 1e-14
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 60) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < d) {
            app += a(p)(i) * a(p)(i); aqq += a(q)(i) * a(q)(i)
            apq += a(p)(i) * a(q)(i); i += 1
          }
          if (math.abs(apq) > eps * math.sqrt(app * aqq) && apq != 0.0) {
            rotated = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t = math.signum(zeta) /
              (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < d) {
              val ap = a(p)(i); val aq = a(q)(i)
              a(p)(i) = c * ap - s * aq; a(q)(i) = s * ap + c * aq
              val vp = v(p)(i); val vq = v(q)(i)
              v(p)(i) = c * vp - s * vq; v(q)(i) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // u columns = normalized surviving a columns; complete the
    // near-null ones (tiny singular values) by Gram–Schmidt over
    // identity candidates so R stays orthogonal end to end
    val u = Array.ofDim[Double](d, d) // column-major: u(j) = column j
    val norms = a.map(cAr => math.sqrt(cAr.map(x => x * x).sum))
    val maxNorm = math.max(norms.max, 1e-300)
    val live = Array.tabulate(d)(j => norms(j) > 1e-10 * maxNorm)
    (0 until d).foreach { j =>
      if (live(j)) {
        var i = 0
        while (i < d) { u(j)(i) = a(j)(i) / norms(j); i += 1 }
      }
    }
    (0 until d).foreach { j =>
      if (!live(j)) {
        var cand = 0
        var done = false
        while (!done && cand < d) {
          val w = Array.tabulate(d)(i => if (i == cand) 1.0 else 0.0)
          (0 until d).foreach { jj =>
            if (jj != j && (live(jj) || jj < j)) {
              var dot = 0.0
              var i = 0
              while (i < d) { dot += w(i) * u(jj)(i); i += 1 }
              i = 0
              while (i < d) { w(i) -= dot * u(jj)(i); i += 1 }
            }
          }
          val n = math.sqrt(w.map(x => x * x).sum)
          if (n > 1e-6) {
            var i = 0
            while (i < d) { u(j)(i) = w(i) / n; i += 1 }
            done = true
          }
          cand += 1
        }
        require(done, "orthonormal completion failed")
        live(j) = true
      }
    }
    // R = U·Vᵀ, row-major: R[i][k] = Σ_j U[i][j]·V[k][j]
    Array.tabulate(d)(i => Array.tabulate(d)(kk => {
      var s = 0.0
      var j = 0
      while (j < d) { s += u(j)(i) * v(j)(kk); j += 1 }
      s
    }))
  }
}
