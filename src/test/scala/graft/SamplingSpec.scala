package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends GraftSuite {
  import spark.implicits._

  test("hexThreshold endpoints and known rates") {
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(0.0) == "0")
    assert(Sampling.hexThreshold(-1.0) == "0")
    assert(Sampling.hexThreshold(2.0) == "g")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.1) == "1999999a")
    assert(Sampling.hexThreshold(0.05) == "0ccccccd")
  }

  test("uniform sample hits the rate within the md5-uniformity tolerance") {
    val n = 20000
    val df = spark.range(n).toDF("id")
    val kept = Sampling.uniform(df, col("id"), 0.3).count()
    // md5 nibbles are uniform; 3σ for Binomial(20000, 0.3) ≈ 195
    assert(math.abs(kept - 6000L) < 300, s"kept $kept of $n at rate 0.3")
  }

  test("sampling is deterministic, idempotent, and union-stable") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.uniform(df, col("id"), 0.4).as[Long].collect().toSet
    val b = Sampling.uniform(df, col("id"), 0.4).as[Long].collect().toSet
    assert(a == b)
    // sampling a shard selects the same ids the full pass selects
    val shard = Sampling.uniform(df.where(col("id") < 1000), col("id"), 0.4)
      .as[Long].collect().toSet
    assert(shard == a.filter(_ < 1000))
    // rate monotonicity: a lower-rate sample is a subset
    val smaller = Sampling.uniform(df, col("id"), 0.2).as[Long].collect().toSet
    assert(smaller.subsetOf(a))
  }

  test("stratified applies per-stratum rates with the default fallback") {
    val df = (0 until 8000).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("id", "src")
    val out = Sampling.stratified(df, col("id"), col("src"),
        rates = Map("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.0),
        defaultRate = 0.25)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out("s0") == 2000L)                      // rate 1.0: all
    assert(!out.contains("s2"))                     // rate 0.0: none
    assert(math.abs(out("s1") - 1000L) < 150)       // rate 0.5
    assert(math.abs(out.getOrElse("s3", 0L) - 500L) < 120) // default 0.25
  }

  test("temperatureMix: exact isqrt-weighted budgets, head domain flattened, deterministic") {
    val docs = graft.io.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"))
    val sel = Sampling.temperatureMix(docs, domain = col("lang"),
      id = col("doc_id"), nTarget = 250)
    val taken = sel.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // expected budgets computed independently from the counts
    val counts = docs.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val wts = counts.view.mapValues(c => math.floor(math.sqrt(c.toDouble))
      .toLong).toMap
    val tot = wts.values.sum
    val want = wts.view.mapValues(w => w * 250L / tot)
      .filter(_._2 >= 1).toMap
    assert(taken == want.filter { case (l, b) => b.min(counts(l)) > 0 }
      .map { case (l, b) => l -> b.min(counts(l)) },
      s"taken $taken vs budgets $want")
    // exact counts, not in-expectation: every domain hits its budget
    // precisely (counts here all exceed their budgets)
    assert(taken.values.sum == want.values.sum)
    // the flattening claim: the head domain's selected share is
    // strictly below its corpus share
    val headLang = counts.maxBy(_._2)._1
    val corpusShare = counts(headLang).toDouble / counts.values.sum
    val mixShare = taken(headLang).toDouble / taken.values.sum
    assert(mixShare < corpusShare,
      s"head $headLang not flattened: $mixShare vs $corpusShare")
    // per-domain ranks are dense 1..budget
    val ranks = sel.select(col("lang"), col("rnk"))
      .as[(String, Long)].collect().groupBy(_._1)
    ranks.foreach { case (l, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length),
        s"ranks not dense for $l")
    }
    // deterministic under a different partitioning
    val again = Sampling.temperatureMix(docs.repartition(13),
        domain = col("lang"), id = col("doc_id"), nTarget = 250)
      .select(col("doc_id"), col("lang"), col("rnk"))
      .as[(Long, String, Long)].collect().toSet
    assert(again == sel.select(col("doc_id"), col("lang"), col("rnk"))
      .as[(Long, String, Long)].collect().toSet)
  }

  test("priorityPerStratum == straight-line DLT replay; invariants on both hash families") {
    val docs = graft.io.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        greatest(col("n_chars"), lit(1L)).as("w"))
    val k = 7
    def run(hk: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Sampling.priorityPerStratum(docs, key = col("doc_id"),
        stratum = col("source"), weight = col("w"), k = k, hashKey = hk)
    val seeded: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => graft.operators.QualityModel.seededKey(t.cast("string"))
    for ((name, hk, hashOf) <- Seq(
        ("xxhash64", (c: org.apache.spark.sql.Column) => xxhash64(c),
          (df: org.apache.spark.sql.DataFrame) =>
            df.select(col("doc_id"), xxhash64(col("doc_id")).as("h"))),
        ("seeded", seeded,
          (df: org.apache.spark.sql.DataFrame) =>
            df.select(col("doc_id"), graft.operators.QualityModel
              .seededKey(col("doc_id").cast("string")).as("h"))))) {
      val got = run(hk)
        .select("source", "doc_id", "w", "rnk", "u", "priority", "tau",
          "w_est")
        .as[(String, Long, Long, Long, Double, Double,
          Option[Double], Double)].collect()
      // straight-line DLT over collected rows, same IEEE ops
      val hashes = hashOf(docs).as[(Long, Long)].collect().toMap
      val rows = docs.select("source", "doc_id", "w")
        .as[(String, Long, Long)].collect()
      val m = 2147483648.0
      val byStratum = rows.groupBy(_._1)
      val refRows = byStratum.toSeq.flatMap { case (src, rs) =>
        val withP = rs.toSeq.map { case (_, id, w) =>
          val hm = ((hashes(id) % 2147483648L) + 2147483648L) % 2147483648L
          val u = (hm + 1L).toDouble / m
          (id, w, u, w.toDouble / u)
        }.sortBy { case (id, _, _, p) => (-p, id) }
        val tau = if (withP.length > k) Some(withP(k)._4) else None
        withP.take(k).zipWithIndex.map { case ((id, w, u, p), i) =>
          (src, id, w, (i + 1).toLong, u, p, tau,
            tau.fold(w.toDouble)(t => math.max(w.toDouble, t)))
        }
      }.toSet
      assert(got.toSet == refRows,
        s"$name diverged from the straight-line DLT replay")
      // invariants: per-stratum size, u range, w_est >= w, estimator
      // totals are exact on whole-stratum (tau-null) strata
      val sizes = byStratum.view.mapValues(_.length).toMap
      got.groupBy(_._1).foreach { case (src, g) =>
        assert(g.length == math.min(k, sizes(src)))
        assert(g.map(_._4).sorted.toSeq == (1L to g.length))
      }
      assert(got.forall(r => r._5 > 0.0 && r._5 <= 1.0), "u out of (0,1]")
      assert(got.forall(r => r._8 >= r._3.toDouble), "w_est < w")
      got.filter(_._7.isEmpty).groupBy(_._1).foreach { case (src, g) =>
        val tot = byStratum(src).map(_._3).sum.toDouble
        assert(g.map(_._8).sum == tot,
          s"whole-stratum $src estimator total not exact")
      }
      // determinism under a different partitioning
      val again = run(hk)
        .select("source", "doc_id", "rnk")
        .as[(String, Long, Long)].collect().toSet
      val againPart = Sampling.priorityPerStratum(docs.repartition(13),
          key = col("doc_id"), stratum = col("source"),
          weight = col("w"), k = k, hashKey = hk)
        .select("source", "doc_id", "rnk")
        .as[(String, Long, Long)].collect().toSet
      assert(again == againPart, s"$name not partition-invariant")
    }
  }
}
