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
}
