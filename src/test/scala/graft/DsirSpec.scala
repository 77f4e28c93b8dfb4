package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance resampling: log-ratio weights, the integer count
  * core, and the Gumbel-top-k resample. */
class DsirSpec extends GraftSuite {

  test("importance weights: target-only features positive, raw-only negative; counts core hand-checks") {
    val s = spark; import s.implicits._
    val target = Seq((1L, "gold gold gold signal"),
      (2L, "gold signal gold")).toDF("doc_id", "text")
    val raw = Seq((10L, "noise words everywhere"),
      (11L, "gold among noise words"),
      (12L, "noise noise")).toDF("doc_id", "text")
    val dim = 64
    val w = Dsir.importanceWeights(target, raw, col("doc_id"),
      col("text"), dim, alpha = 0.5, scale = 1000)
    assert(w.length == dim)
    // resolve a token's bucket through Spark itself (one-row frame),
    // so the test can't drift from the operator's hash
    def bucket(tok: String): Int =
      Seq(tok).toDF("t")
        .select(pmod(xxhash64(col("t")), lit(dim.toLong)))
        .head().getLong(0).toInt
    assert(w(bucket("gold")) > 0, "target-dominant feature not positive")
    assert(w(bucket("noise")) < 0, "raw-only feature not negative")
    // counts core: doc 12 "noise noise" → feats {noise, noise,
    // 'noise noise'}: n_feats 3; target count of all three buckets 0
    // (modulo hash collisions at dim=64 — use the relation, not
    // absolutes): sum_ct ≤ sum over target mass, sum_cr ≥ in-doc hits
    val counts = Dsir.scoreCounts(raw, col("doc_id"), col("text"),
        Dsir.bucketCounts(target, col("doc_id"), col("text"), dim),
        Dsir.bucketCounts(raw, col("doc_id"), col("text"), dim),
        dim)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(counts(12L)._1 == 3L)
    // every raw doc's own features exist in the raw table: each of
    // its n_feats buckets has raw count ≥ its in-doc multiplicity,
    // so sum_cr ≥ n_feats always
    counts.values.foreach { case (n, _, cr) => assert(cr >= n) }
  }

  test("resample: deterministic Gumbel top-k enriches target-like docs; k = n returns everything; zero-Exchange scoring") {
    val s = spark; import s.implicits._
    // raw corpus: 100 docs of EQUAL length, every 5th substituting
    // the target marker for a filler token — equal length matters:
    // the DSIR weight is a likelihood-ratio PRODUCT over features,
    // so longer docs accumulate more (typically negative) log mass
    // regardless of content (the method's length bias; the
    // length-normalized variant is margin/n_feats, available from
    // the same scored frame)
    val raw = (0 until 100).map { i =>
      val head = if (i % 5 == 0) "goldmark" else "filler"
      (i.toLong, s"$head tokens common words shared $i")
    }.toDF("doc_id", "text")
    val target = Seq((1000L, "goldmark tokens goldmark special"),
      (1001L, "goldmark special goldmark")).toDF("doc_id", "text")
    val dim = 512
    val w = Dsir.importanceWeights(target, raw, col("doc_id"),
      col("text"), dim)
    val picked = Dsir.resample(raw, col("doc_id"), col("text"), w,
        k = 20)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 20)
    val markerRate = picked.count(_ % 5 == 0) / 20.0
    assert(markerRate >= 0.6,
      s"resample did not enrich target-like docs: rate $markerRate vs 0.2 base")
    // deterministic replay
    val again = Dsir.resample(raw, col("doc_id"), col("text"), w, k = 20)
      .select("id").as[Long].collect().toSet
    assert(again == picked)
    // k = n: everything comes back, ranks dense 1..n
    val all = Dsir.resample(raw, col("doc_id"), col("text"), w, k = 100)
      .select("rnk").as[Long].collect().sorted
    assert(all.toSeq == (1L to 100L))
    // the scoring half is the quality-model zero-Exchange scan
    val scored = Dsir.logImportance(raw, col("doc_id"), col("text"), w)
    scored.collect()
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"),
      "DSIR scoring shuffled")
  }
}
