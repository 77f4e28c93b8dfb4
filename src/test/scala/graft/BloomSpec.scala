package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, QualityModel}

/** Bloom bit-set contracts: no false negatives ever (at every size,
  * both hash families), merge == union on OVERLAPPING builds
  * (distinct-idempotence — replay-safe like HLL, unlike CMS's SUM),
  * the FPR envelope at a sized filter, probe correctness against
  * brute membership, and partition invariance. */
class BloomSpec extends GraftSuite {
  import spark.implicits._

  private val hashFamilies = Seq(
    "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
    "seeded" -> QualityModel.seededKey)

  private def values(n: Int, tag: String) =
    (0 until n).map(i => s"$tag$i").toDF("v")

  test("no false negatives: every built value probes might_contain=1, all sizes, both families") {
    val build = values(500, "in")
    for ((fam, key) <- hashFamilies; m <- Seq(64, 1024, 1 << 16); k <- Seq(1, 3, 7)) {
      val bits = Bloom.bloomBits(build, col("v"), m, k, key)
      val got = Bloom.mightContain(bits, build, col("v"), m, k, key)
        .as[(String, Int)].collect()
      assert(got.length == 500, s"$fam m=$m k=$k")
      got.foreach { case (v, mc) =>
        assert(mc == 1, s"$fam m=$m k=$k: false negative on $v")
      }
    }
  }

  test("bloomMerge(bloom(A), bloom(B)) == bloom(A union B) on overlapping builds; idempotent") {
    val a = values(300, "x")               // x0..x299
    val b = values(450, "x")               // x0..x449 — 300 shared
    for ((fam, key) <- hashFamilies) {
      val merged = Bloom.bloomMerge(
          Bloom.bloomBits(a, col("v"), 2048, 3, key),
          Bloom.bloomBits(b, col("v"), 2048, 3, key))
        .as[Long].collect().toSet
      val oneShot = Bloom.bloomBits(a.unionByName(b), col("v"), 2048, 3, key)
        .as[Long].collect().toSet
      assert(merged == oneShot, fam)
      val bitsA = Bloom.bloomBits(a, col("v"), 2048, 3, key)
      assert(Bloom.bloomMerge(bitsA, bitsA).as[Long].collect().toSet ==
        bitsA.as[Long].collect().toSet, s"$fam: not idempotent")
    }
  }

  test("mightContain survives a non-deduplicated bits frame (no false negatives from a raw union)") {
    // a caller who unions two filters without bloomMerge hands over
    // duplicate bit rows; if the probe join counted them, count(__hit)
    // would pass k and flip built values to might_contain=0 — the
    // false negative the internal distinct() exists to prevent
    val build = values(200, "in")
    for ((fam, key) <- hashFamilies) {
      val bits = Bloom.bloomBits(build, col("v"), 1024, 3, key)
      val raw = bits.unionByName(bits)                 // NOT bloomMerge
      val viaRaw = Bloom.mightContain(raw, build, col("v"), 1024, 3, key)
        .as[(String, Int)].collect().toMap
      val viaClean = Bloom.mightContain(bits, build, col("v"), 1024, 3, key)
        .as[(String, Int)].collect().toMap
      assert(viaRaw == viaClean, fam)
      assert(viaRaw.values.forall(_ == 1), s"$fam: false negative")
    }
  }

  test("FPR envelope: sized filter keeps false positives near (bitsSet/m)^k") {
    // 1000 values in a 2^16-bit filter with k=3: load ~ 3000/65536,
    // predicted FPR ~ (0.045)^3 ~ 1e-4; probe 20000 outsiders and
    // assert well under 1% — an order of magnitude of slack over the
    // prediction, tight enough to catch a broken probe or bit layout
    val build = values(1000, "in")
    val outsiders = values(20000, "out")
    for ((fam, key) <- hashFamilies) {
      val bits = Bloom.bloomBits(build, col("v"), 1 << 16, 3, key)
      val fp = Bloom.mightContain(bits, outsiders, col("v"), 1 << 16, 3, key)
        .where(col("might_contain") === 1).count()
      assert(fp < 200, s"$fam: $fp false positives of 20000")
    }
  }

  test("tokenMembership: might_contain >= actual row for row; actual matches brute membership") {
    val bench = Seq((0L, "alpha beta gamma"), (20L, "delta")).toDF("doc_id", "text")
    val corpus = bench.unionByName(
      Seq((1L, "alpha epsilon"), (2L, "zeta eta beta")).toDF("doc_id", "text"))
    for ((fam, key) <- hashFamilies) {
      val rows = Bloom.tokenMembership(bench, corpus, col("text"),
          mBits = 4096, k = 3, key)
        .as[(String, Int, Int)].collect()
      val benchVocab = Set("alpha", "beta", "gamma", "delta")
      assert(rows.map(_._1).toSet ==
        Set("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"), fam)
      rows.foreach { case (tok, mc, actual) =>
        assert(actual == (if (benchVocab(tok)) 1 else 0), s"$fam/$tok actual")
        assert(mc >= actual, s"$fam/$tok: false negative")
      }
    }
  }

  test("overlapStatsBloomFrame >= exact overlapStats per doc; == at collision-free mBits") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),          // bench (doc_id % 20 == 0)
      (20L, "k l m n o p q r"),             // bench
      (1L, "a b c d e f z z2 z3"),          // train, overlaps bench
      (2L, "x1 x2 x3 x4 x5 x6 x7"),         // train, disjoint
      (3L, "k l m n o p q r s"))            // train, heavy overlap
      .toDF("doc_id", "text")
    val train = docs.where(col("doc_id") % 20 =!= 0)
    val bench = docs.where(col("doc_id") % 20 === 0)
    val exact = graft.operators.Decontaminate.overlapStats(
        train, bench, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    for ((fam, key) <- hashFamilies) {
      // tight frame: one-sided per doc (n_matched can only inflate)
      val tight = graft.operators.Decontaminate.overlapStatsBloomFrame(
          train, bench, col("doc_id"), col("text"), n = 3,
          threshold = 0.5, mBits = 64, k = 2, key)
        .as[(Long, Long, Long, Double, Int)].collect()
      assert(tight.map(_._1).toSet == exact.keySet, fam)
      tight.foreach { r =>
        val e = exact(r._1)
        assert(r._2 == e._2, s"$fam/${r._1}: n_shingles moved")
        assert(r._3 >= e._3, s"$fam/${r._1}: false negative in the frame gate")
        assert(r._5 >= e._5, s"$fam/${r._1}: contamination under-detected")
      }
      // collision-free frame: the gate reproduces exact row for row
      val wide = graft.operators.Decontaminate.overlapStatsBloomFrame(
          train, bench, col("doc_id"), col("text"), n = 3,
          threshold = 0.5, mBits = 1 << 24, k = 3, key)
        .as[(Long, Long, Long, Double, Int)].collect()
        .map(r => r._1 -> r).toMap
      assert(wide == exact, s"$fam: wide frame != exact")
    }
  }

  test("bit frame is partition-invariant and bounded by mBits") {
    val build = values(5000, "p")
    for ((fam, key) <- hashFamilies) {
      val a = Bloom.bloomBits(build, col("v"), 256, 3, key)
        .as[Long].collect().toSet
      val b = Bloom.bloomBits(build.repartition(11), col("v"), 256, 3, key)
        .as[Long].collect().toSet
      assert(a == b, fam)
      assert(a.size <= 256 && a.forall(bit => bit >= 0 && bit < 256), fam)
    }
  }
}
