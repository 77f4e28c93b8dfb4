package graft

import org.apache.spark.sql.functions._

import graft.operators.Hdr

/** Log-linear quantile histogram contracts: bucket containment and
  * the 2^-b relative-width bound (recomputed bucket-for-bucket in
  * plain Scala bit arithmetic), idx monotonicity in the value, the
  * merge == union identity that makes the frame a store/streaming
  * artifact, partition invariance, the exact-region identity
  * (values below 2^(b+1) reproduce percentile_disc exactly), the
  * one-sided quantile envelope est <= true <= est + width - 1 on
  * planted uniform / zipf / constant distributions, and group
  * isolation. No hash family axis: the operator is pure integer
  * arithmetic (its query surface is oracle-green outright). */
class HdrSpec extends GraftSuite {
  import spark.implicits._

  /** Straight-line reference bucketing — independent bit arithmetic
    * the Column expressions are measured against. */
  private def refBucket(v: Long, b: Int): (Long, Long, Long) = {
    require(v >= 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v | 1L)
    val s = math.max(e - b, 0)
    val m = v >>> s
    (s.toLong * (1L << (b + 1)) + m, m << s, (m << s) + (1L << s) - 1)
  }

  /** Exact percentile_disc: smallest value with rank >= ceil(q*n). */
  private def refQuantile(vs: Seq[Long], q: Double): Long = {
    val sorted = vs.sorted
    val rank = math.max(math.ceil(q * sorted.size).toLong, 1L)
    sorted((rank - 1).toInt)
  }

  private val probeValues: Seq[Long] =
    Seq(0L, 1L, 2L, 3L, 62L, 63L, 64L, 65L, 127L, 128L, 129L, 1000L,
      65535L, 65536L, (1L << 40) - 1, 1L << 40, (1L << 40) + 12345L,
      (1L << 62) - 1, 1L << 62, Long.MaxValue)

  test("bucket arithmetic matches straight-line bit arithmetic; lo <= v <= hi; width <= lo >> b") {
    for (b <- Seq(1, 3, 5, 8)) {
      val got = Hdr.frame(probeValues.toDF("x"), col("x"), b)
        .select("idx", "lo", "hi", "cnt")
        .as[(Long, Long, Long, Long)].collect()
        .map { case (idx, lo, hi, _) => (idx, lo, hi) }.toSet
      val want = probeValues.map(refBucket(_, b)).toSet
      assert(got == want, s"b=$b")
      probeValues.foreach { v =>
        val (_, lo, hi) = refBucket(v, b)
        assert(lo <= v && v <= hi, s"b=$b v=$v outside [$lo,$hi]")
        // relative width: singleton below 2^(b+1), else <= lo * 2^-b
        if (v >= (1L << (b + 1))) assert(hi - lo + 1 <= (lo >>> b))
        else assert(lo == v && hi == v, s"b=$b v=$v not singleton")
      }
    }
  }

  test("idx is monotone in the value — rank over the frame is rank over the values") {
    for (b <- Seq(1, 5)) {
      val byValue = probeValues.sorted.map(refBucket(_, b)._1)
      assert(byValue == byValue.sorted, s"b=$b idx order diverges from value order")
    }
  }

  test("merge(hdr(A), hdr(B)) == hdr(A disjoint-union B), bucket for bucket") {
    val a = Seq(3L, 17L, 17L, 900L, 0L).toDF("x")
    val other = Seq(17L, 901L, 1L << 33).toDF("x")
    val merged = Hdr.merge(Hdr.frame(a, col("x")), Hdr.frame(other, col("x")))
      .as[(Long, Long, Long, Long)].collect().toSet
    val oneShot = Hdr.frame(a.unionAll(other), col("x"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(merged == oneShot)
  }

  test("partition invariance: the frame is identical under any repartitioning") {
    val vs = (0 until 500).map(i => (i.toLong * i * 37) % 100000).toDF("x")
    val base = Hdr.frame(vs, col("x")).as[(Long, Long, Long, Long)]
      .collect().toSet
    for (p <- Seq(1, 7, 32)) {
      val got = Hdr.frame(vs.repartition(p), col("x"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == base, s"p=$p")
    }
  }

  test("exact region: values below 2^(b+1) reproduce percentile_disc exactly") {
    val vs = Seq.tabulate(200)(i => (i * 13L) % 63) // all < 2^6, b=5
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Hdr.quantiles(Hdr.frame(vs.toDF("x"), col("x"), 5), qs)
      .as[(Double, Long, Long)].collect()
      .map { case (q, n, est) => q -> (n, est) }.toMap
    qs.foreach { q =>
      val (n, est) = got(q)
      assert(n == vs.size)
      assert(est == refQuantile(vs, q), s"q=$q")
    }
  }

  test("envelope: est <= true <= est + width - 1 (relative error <= 2^-b) on planted distributions") {
    val dists: Seq[(String, Seq[Long])] = Seq(
      "uniform" -> (1 to 2000).map(i => (i * 2654435761L) % 1000000),
      "zipf" -> (1 to 2000).map(i => (1000000.0 / i).toLong),
      "constant" -> Seq.fill(500)(123456L),
      "two-point" -> (Seq.fill(990)(10L) ++ Seq.fill(10)(1L << 50)))
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
    for ((name, vs) <- dists; b <- Seq(3, 5, 8)) {
      val est = Hdr.quantiles(Hdr.frame(vs.toDF("x"), col("x"), b), qs)
        .as[(Double, Long, Long)].collect()
        .map { case (q, _, e) => q -> e }.toMap
      qs.foreach { q =>
        val truth = refQuantile(vs, q)
        val (_, lo, hi) = refBucket(truth, b)
        assert(est(q) == lo, s"$name b=$b q=$q: est not the truth's bucket lo")
        assert(est(q) <= truth && truth <= est(q) + (hi - lo),
          s"$name b=$b q=$q envelope")
      }
    }
  }

  test("group isolation: per-group frame and quantiles == the filtered one-shot") {
    val rows = (0 until 300).map { i =>
      (if (i % 3 == 0) "a" else "b", (i.toLong * 7919) % 5000)
    }.toDF("g", "x")
    val frames = Hdr.frame(rows, col("x"), groupCols = Seq("g"))
    for (g <- Seq("a", "b")) {
      val got = frames.where(col("g") === g).drop("g")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = Hdr.frame(rows.where(col("g") === g), col("x"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"frame g=$g")
    }
    val qs = Seq(0.5, 0.9)
    val gq = Hdr.quantiles(frames, qs, groupCols = Seq("g"))
      .as[(String, Double, Long, Long)].collect()
      .map { case (g, q, n, e) => (g, q) -> (n, e) }.toMap
    for (g <- Seq("a", "b"); q <- qs) {
      val want = Hdr.quantiles(
          Hdr.frame(rows.where(col("g") === g), col("x")), qs)
        .as[(Double, Long, Long)].collect()
        .map { case (qq, n, e) => qq -> (n, e) }.toMap
      assert(gq((g, q)) == want(q), s"quantiles g=$g q=$q")
    }
  }

  test("bucketByQuantiles matches the straight-line threshold replay; monotone in the value") {
    val dists: Seq[(String, Seq[Long])] = Seq(
      "uniform" -> (1 to 1000).map(i => (i * 2654435761L) % 50000),
      "zipf" -> (1 to 1000).map(i => (50000.0 / i).toLong),
      "mass-point" -> (Seq.fill(800)(7L) ++ (1 to 200).map(_ * 11L)))
    for ((name, vs) <- dists; k <- Seq(4, 10)) {
      val ths = (1 until k)
        .map(i => refBucket(refQuantile(vs, i.toDouble / k), 5)._2)
        .sorted
      val got = graft.operators.Hdr.bucketByQuantiles(
          vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
            .toDF("id", "x"),
          col("x"), nBuckets = k)
        .select("id", "x", "bucket")
        .as[(Long, Long, Long)].collect()
      got.foreach { case (_, v, b) =>
        assert(b == 1 + ths.count(_ <= v), s"$name k=$k v=$v")
      }
      // monotone: sorting by value never decreases the bucket
      val byV = got.sortBy(_._2).map(_._3)
      assert(byV.sameElements(byV.sorted), s"$name k=$k monotone")
      // every bucket id stays in range
      assert(got.forall(r => r._3 >= 1 && r._3 <= k), s"$name k=$k range")
    }
  }

  test("coarsen(frame(b), b, b') == frame(b') exactly — multi-resolution without rescan") {
    val vs = (probeValues ++ (1 to 500).map(i => (i.toLong * 7919) % 100000))
      .toDF("x")
    for ((bFrom, bTo) <- Seq((5, 3), (8, 1), (8, 5))) {
      val got = graft.operators.Hdr.coarsen(
          graft.operators.Hdr.frame(vs, col("x"), bFrom), bFrom, bTo)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = graft.operators.Hdr.frame(vs, col("x"), bTo)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"$bFrom -> $bTo")
    }
  }

  test("group-keyed coarsen: per-group identity holds; forgotten keys are rejected") {
    val vs = (1 to 400).map(i => (if (i % 2 == 0) "a" else "b",
      (i.toLong * 7919) % 50000)).toDF("src", "x")
    val fine = graft.operators.Hdr.frame(vs, col("x"), 8, Seq("src"))
    val got = graft.operators.Hdr.coarsen(fine, 8, 3, Seq("src"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.Hdr.frame(vs, col("x"), 3, Seq("src"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // a group-keyed frame coarsened WITHOUT its keys would silently
    // collapse into one global histogram — the require catches it
    intercept[IllegalArgumentException] {
      graft.operators.Hdr.coarsen(fine, 8, 3)
    }
  }

  test("weighted frame: cnt is the bucket mass; weighted quantiles == expansion replay") {
    val vs = Seq(1L, 3L, 3L, 10L, 40L, 40L, 100L)
    val f = graft.operators.Hdr.frame(vs.toDF("x"), col("x"),
      weight = col("x")) // mass distribution: weight = the value
    val gotMass = f.select("idx", "cnt").as[(Long, Long)].collect().toMap
    val wantMass = vs.groupBy(refBucket(_, 5)._1)
      .view.mapValues(_.sum).toMap
    assert(gotMass == wantMass)
    // a weighted quantile is the plain quantile of the weight-
    // expanded multiset (weights are integer by contract)
    val expanded = vs.flatMap(v => Seq.fill(v.toInt)(v))
    val qs = Seq(0.25, 0.5, 0.9)
    val got = graft.operators.Hdr.quantiles(f, qs)
      .as[(Double, Long, Long)].collect()
      .map { case (q, n, e) => q -> (n, e) }.toMap
    qs.foreach { q =>
      val (n, est) = got(q)
      assert(n == expanded.size)
      assert(est == refBucket(refQuantile(expanded, q), 5)._2, s"q=$q")
    }
  }

  test("negative and null measures are excluded by contract") {
    val vs = Seq[java.lang.Long](5L, -3L, null, 0L)
      .toDF("x")
    val got = Hdr.frame(vs, col("x")).agg(sum("cnt")).as[Long].head()
    assert(got == 2L) // only 5 and 0 survive
  }
}
