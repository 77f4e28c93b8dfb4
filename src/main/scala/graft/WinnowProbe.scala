package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityModel}
import graft.io.Tables

/** r15 investigation harness for the elevated shingle-family prices
  * (VERDICT r14 "What's wrong" #1: if q_dedup_winnow_verified still
  * prices >= ~20 s on a quiet host, the era story is wrong — it did:
  * 24.6 s in-suite / 23.4 isolated, 3 quiet runs, stall 0). Stage
  * breakdown located the cost (the candidate self-join re-deriving
  * the normalize+split+md5 lineage per consumer, plus the 914k-pair
  * verify volume); the fix — the ONE-PASS k-gram lineage now shipped
  * in [[Dedup.winnowVerifiedPairs]] — is A/B'd here against the
  * pre-r15 multi-pass control, same JVM, alternating arms, identity
  * asserted before any clock. Evidence feeds PERF.md r15. */
object WinnowProbe {

  /** The PRE-r15 multi-lineage form of winnowVerifiedPairs, kept
    * here verbatim as the A/B control: candidates re-derive the
    * normalize+split+hash lineage from text once per consumer (~5x).
    * The shipped form is now the one-pass variant this probe
    * measured in (identity-asserted at sf1: 5580 rows equal). */
  def winnowVerifiedMultiPass(df: DataFrame, id: Column, text: Column,
                              k: Int, w: Int,
                              hashKey: Column => Column,
                              maxFpDf: Option[Int],
                              maxHashPerDoc: Option[Int]): DataFrame = {
    val runFloor = w + k - 1
    val cands = Dedup.winnowCandidatePairs(df, id, text, k, w, hashKey,
      maxFpDf)
    val kg = Dedup.kgramHashes(df, id, text, k, hashKey, maxHashPerDoc)
    val matched = cands
      .join(kg.select(col("id").as("id_a"), col("pos").as("__i"),
        col("h")), "id_a")
      .join(kg.select(col("id").as("id_b"), col("pos").as("__j"),
        col("h")), Seq("id_b", "h"))
    val byDiag = Window.partitionBy("id_a", "id_b", "__d").orderBy("__i")
    matched
      .select(col("id_a"), col("id_b"), col("n_shared"), col("__i"),
        (col("__i") - col("__j")).as("__d"))
      .withColumn("__grp", col("__i") - row_number().over(byDiag))
      .groupBy("id_a", "id_b", "n_shared", "__d", "__grp")
      .agg(count(lit(1)).as("__len"))
      .groupBy("id_a", "id_b", "n_shared")
      .agg((max(col("__len")) + (k - 1)).cast("int").as("longest_run"))
      .where(col("longest_run") >= runFloor)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/bench_data/sf1")
    val reps = sys.env.getOrElse("WINNOW_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents
    docs.count() // warm the scan

    // "shipped" = the r15 one-pass form now in Dedup; "multipass" =
    // the pre-r15 control replicated above
    def shipped() = Dedup.winnowVerifiedPairs(docs,
      col("doc_id"), col("text"), k = 5, w = 4,
      hashKey = QualityModel.seededKey, maxFpDf = Some(64),
      maxHashPerDoc = Some(64))
    def multipass() = winnowVerifiedMultiPass(docs,
      col("doc_id"), col("text"), k = 5, w = 4,
      hashKey = QualityModel.seededKey, maxFpDf = Some(64),
      maxHashPerDoc = Some(64))

    // identity BEFORE any clock
    val a = shipped().orderBy("id_a", "id_b").collect().toSeq
    val b = multipass().orderBy("id_a", "id_b").collect().toSeq
    require(a == b,
      s"variant diverges: shipped=${a.size} rows, multipass=${b.size}; " +
        s"first diff=${a.zip(b).find(p => p._1 != p._2)}")
    println(s"identity_ok=true rows=${a.size}")
    spark.sharedState.cacheManager.clearCache()

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jitMs: Long =
      ManagementFactory.getCompilationMXBean.getTotalCompilationTime

    def time(tag: String, mk: () => DataFrame): Double = {
      System.gc() // the Bench hygiene: last run's garbage off my clock
      val (g0, j0) = (gcMs, jitMs)
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"$tag%-14s $s%6.2f s  gc=${(gcMs - g0) / 1000.0}%5.2f s " +
        f"jit=${(jitMs - j0) / 1000.0}%6.2f s")
      s
    }

    // stage breakdown of the SHIPPED form (each stage from cold)
    def stage(tag: String, act: () => Long): Unit = {
      System.gc()
      val (g0, j0) = (gcMs, jitMs)
      val t0 = System.nanoTime()
      val n = act()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"stage:$tag%-22s $s%6.2f s  rows=$n%-9d " +
        f"gc=${(gcMs - g0) / 1000.0}%5.2f jit=${(jitMs - j0) / 1000.0}%6.2f")
    }
    val key = QualityModel.seededKey
    stage("fingerprints", () =>
      Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), 5, 4, key)
        .count())
    stage("kgram_all", () =>
      Dedup.kgramHashes(docs, col("doc_id"), col("text"), 5, key, None)
        .count())
    stage("kgram_capped", () =>
      Dedup.kgramHashes(docs, col("doc_id"), col("text"), 5, key, Some(64))
        .count())
    stage("candidates", () =>
      Dedup.winnowCandidatePairs(docs, col("doc_id"), col("text"), 5, 4,
        key, Some(64)).count())
    stage("verified_full", () => shipped().count())

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    // r16 JIT-band experiment (VERDICT r15 ask #6): the winnow band
    // (15.3–20.3 s same-code) is mechanism-named — JIT recompilation
    // churn on the repo's widest codegen surface, with 5–7 s of JIT
    // per rep. ONE structural intervention, A/B'd in this same-JVM
    // alternating harness: spark.sql.codegen.hugeMethodLimit=8000
    // aligns Spark's whole-stage-codegen fallback with HotSpot's own
    // huge-method compile refusal (-XX:-DontCompileHugeMethods caps
    // at 8000 bytecode bytes), so a generated method the JIT would
    // refuse (or churn on) runs through the interpreted Catalyst path
    // instead of poisoning the code cache. Control arm:
    // wholeStage=false (the blunt no-codegen form) brackets the
    // intervention from below. WINNOW_PROBE_JIT=1 selects this mode.
    if (sys.env.get("WINNOW_PROBE_JIT").contains("1")) {
      def withConf(k: String, v: String)(body: => Double): Double = {
        val prev = spark.conf.getOption(k)
        spark.conf.set(k, v)
        try body
        finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
      val allArms: Seq[(String, () => Double)] = Seq(
        "default" -> (() => time("default", () => shipped())),
        "huge8k" -> (() =>
          withConf("spark.sql.codegen.hugeMethodLimit", "8000")(
            time("huge8k", () => shipped()))),
        "nocodegen" -> (() =>
          withConf("spark.sql.codegen.wholeStage", "false")(
            time("nocodegen", () => shipped()))))
      // WINNOW_PROBE_ARMS=default,huge8k narrows the A/B (the
      // nocodegen control compiles its own interpreter paths and
      // contaminates the JIT-warming trend the experiment measures)
      val pick = sys.env.get("WINNOW_PROBE_ARMS")
        .map(_.split(",").map(_.trim).toSet)
      val arms = pick.fold(allArms)(p => allArms.filter(a => p(a._1)))
      val series = arms.map(_._1 -> Seq.newBuilder[Double]).toMap
      (1 to reps).foreach { r =>
        val order = if (r % 2 == 1) arms else arms.reverse
        order.foreach { case (nm, run) => series(nm) += run() }
      }
      println(arms.map { case (nm, _) =>
        val xs = series(nm).result()
        f"$nm=${med(xs)}%.2f(min=${xs.min}%.2f,max=${xs.max}%.2f)"
      }.mkString("JIT_ARMS ", " ", ""))
      spark.stop()
      return
    }

    val (as, bs) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      as += time("shipped", () => shipped())
      bs += time("multipass", () => multipass())
    }
    println(f"MEDIAN shipped=${med(as.result())}%.2f " +
      f"multipass=${med(bs.result())}%.2f")
    spark.stop()
  }
}
