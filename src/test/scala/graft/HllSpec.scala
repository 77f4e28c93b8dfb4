package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hll, QualityModel}

/** HyperLogLog contracts: register-grid determinism and partition
  * invariance, merge == union on OVERLAPPING corpora (max-idempotence
  * — stronger than CMS's disjoint-stream SUM), the seeded key's
  * provable distance from the RhoCap clamp, the exact integer
  * harmonic sum + division-only estimate arithmetic, the relative
  * error envelope against a planted cardinality, and group-keyed
  * sketch isolation. */
class HllSpec extends GraftSuite {
  import spark.implicits._

  private val hashFamilies = Seq(
    "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
    "seeded" -> QualityModel.seededKey)

  /** nDocs docs of 100 distinct tokens each — nDocs*100 distinct
    * corpus-wide, plus a null and an empty doc. */
  private def corpus(nDocs: Int, tag: String = "t") =
    ((0 until nDocs).map { d =>
      (d.toLong, (0 until 100).map(i => s"$tag${d}_$i").mkString(" "))
    } ++ Seq((90000L, null.asInstanceOf[String]), (90001L, "")))
      .toDF("doc_id", "text")

  test("register grid is deterministic and partition-invariant, both families") {
    val c = corpus(40)
    for ((fam, key) <- hashFamilies) {
      val a = Hll.tokenRegisters(c, col("text"), 256, key)
        .as[(Long, Int)].collect().toSet
      val b = Hll.tokenRegisters(c.repartition(7), col("text"), 256, key)
        .as[(Long, Int)].collect().toSet
      assert(a == b, fam)
      assert(a.nonEmpty && a.map(_._1).forall(bk => bk >= 0 && bk < 256), fam)
      assert(a.groupBy(_._1).forall(_._2.size == 1), s"$fam: dup bucket")
    }
  }

  test("hllMerge(hll(A), hll(B)) == hll(A union B) even when A and B overlap") {
    val a = corpus(30)            // docs 0..29
    val b = corpus(45)            // docs 0..44 — 30 docs shared
    for ((fam, key) <- hashFamilies) {
      val merged = Hll.hllMerge(
          Hll.tokenRegisters(a, col("text"), 512, key),
          Hll.tokenRegisters(b, col("text"), 512, key))
        .as[(Long, Int)].collect().toSet
      val oneShot = Hll.tokenRegisters(a.unionByName(b), col("text"), 512, key)
        .as[(Long, Int)].collect().toSet
      assert(merged == oneShot, fam)
      // idempotence: merging a sketch with itself is a no-op
      val regs = Hll.tokenRegisters(a, col("text"), 512, key)
      assert(Hll.hllMerge(regs, regs).as[(Long, Int)].collect().toSet ==
        regs.as[(Long, Int)].collect().toSet, s"$fam: not idempotent")
    }
  }

  test("seeded key never reaches the RhoCap clamp (w has 48 bits, rho <= 49)") {
    val regs = Hll.tokenRegisters(corpus(60), col("text"), 4096,
      QualityModel.seededKey)
    val maxRho = regs.agg(max("rho")).as[Int].head()
    assert(maxRho <= 49, s"seeded rho reached $maxRho")
  }

  test("estimate surface: exact integer harmonic sum + the literal double chain") {
    for ((fam, key) <- hashFamilies) {
      val m = 1024
      val regs = Hll.tokenRegisters(corpus(50), col("text"), m, key)
        .as[(Long, Int)].collect()
      val row = Hll.distinctTokens(corpus(50), col("text"), m, key)
        .select("m", "v_empty", "s_scaled", "est")
        .as[(Long, Long, Long, Double)].head()
      val vEmpty = m - regs.length
      val sScaled = regs.map(r => 1L << (Hll.RhoCap - r._2)).sum +
        vEmpty.toLong * (1L << Hll.RhoCap)
      assert(row._1 == m && row._2 == vEmpty && row._3 == sScaled, fam)
      val est = 0.7213 / (1.0 + 1.079 / m.toDouble) * m.toDouble * m.toDouble *
        (1L << Hll.RhoCap).toDouble / sScaled.toDouble
      assert(java.lang.Double.doubleToLongBits(row._4) ==
        java.lang.Double.doubleToLongBits(est), s"$fam: est not bit-identical")
    }
  }

  test("small-m alpha: m in {16,32,64} use the tabulated constants, not the large-m formula") {
    for ((m, a) <- Seq(16 -> 0.673, 32 -> 0.697, 64 -> 0.709)) {
      val regs = Hll.tokenRegisters(corpus(30), col("text"), m,
        hashFamilies.head._2).as[(Long, Int)].collect()
      val vEmpty = m - regs.length
      val sScaled = regs.map(r => 1L << (Hll.RhoCap - r._2)).sum +
        vEmpty.toLong * (1L << Hll.RhoCap)
      val got = Hll.distinctTokens(corpus(30), col("text"), m,
        hashFamilies.head._2).select("est").as[Double].head()
      val want = a * m.toDouble * m.toDouble *
        (1L << Hll.RhoCap).toDouble / sScaled.toDouble
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"m=$m")
      // and the formula constant it must NOT be (visible bias guard)
      val formula = 0.7213 / (1.0 + 1.079 / m.toDouble) * m.toDouble *
        m.toDouble * (1L << Hll.RhoCap).toDouble / sScaled.toDouble
      assert(got != formula, s"m=$m still on the large-m formula")
    }
  }

  test("relative error envelope: planted 30k distinct tokens, m=4096") {
    // raw-HLL regime (n > 2.5m = 10240, no linear-counting correction
    // needed); rsd = 1.04/sqrt(4096) ~ 1.6%, assert 5x
    val n = 30000
    val c = corpus(300)           // 300 docs x 100 distinct = 30000
    for ((fam, key) <- hashFamilies) {
      val est = Hll.distinctTokens(c, col("text"), 4096, key)
        .select("est").as[Double].head()
      val relErr = math.abs(est / n - 1.0)
      assert(relErr < 0.08, f"$fam: est=$est%.0f relErr=$relErr%.3f")
    }
  }

  test("group-keyed sketches are isolated: per-source == per-filtered-corpus") {
    val c = corpus(20, "a").withColumn("source", lit("s1"))
      .unionByName(corpus(25, "b").withColumn("source", lit("s2")))
    for ((fam, key) <- hashFamilies) {
      val grouped = Hll.distinctTokens(c, col("text"), 512, key,
          groupCols = Seq("source"))
        .select("source", "v_empty", "s_scaled", "est")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(grouped.keySet == Set("s1", "s2"), fam)
      for (src <- Seq("s1", "s2")) {
        val solo = Hll.distinctTokens(c.where(col("source") === src),
            col("text"), 512, key)
          .select("v_empty", "s_scaled", "est")
          .as[(Long, Long, Double)].head()
        assert(grouped(src) == solo, s"$fam/$src")
      }
    }
  }
}
