package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.GraftExtensions

class ExtensionsSpec extends GraftSuite {

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(hashed_shingles(array('a','b','c'), 1)) AS sh,
        |       size(minhash_sig(hashed_shingles(array('a','b','c'), 2), 8)) AS k,
        |       sig_agree_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS ag
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 8)
    assert(r.getInt(3) == 2)
  }

  test("vec_dot nulls out on length mismatch and null elements") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D), array(3.0D, 4.0D)) AS mismatch,
        |       vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS withnull
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("TopKPairs survives NaN scores like the window ordering") {
    import graft.plans.TopKAggregate
    val s = spark; import s.implicits._
    // NaN sorts ABOVE +Inf in Spark's total order; it must neither
    // block later insertions nor vanish
    val df = Seq((1L, 0.9), (2L, Double.NaN), (3L, 0.99), (4L, 0.5))
      .toDF("n_id", "score").withColumn("q_id", lit(0L))
    val out = df.groupBy("q_id")
      .agg(TopKAggregate.topkPairs(col("score"), col("n_id"), 3).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("p.id")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 3L, 1L)) // NaN first, then 0.99, 0.9
  }

  test("MinHashSig matches the declarative xxhash64 seed chain bitwise") {
    import graft.plans.HashExpressions
    val s = spark; import s.implicits._
    val k = 8
    val df = Seq(Seq(1L, 7L, -42L, Long.MaxValue), Seq(0L), Seq(5L, 5L))
      .toDF("gh")
    val declarative = (0 until k).map(seed =>
      array_min(transform(col("gh"), h => xxhash64(lit(seed), h))))
    val rows = df.select(
        HashExpressions.minhashSig(col("gh"), k).as("fused"),
        array(declarative: _*).as("ref"))
      .collect()
    assert(rows.forall(r =>
      r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("hashed-shingle jaccard equals string-shingle jaccard") {
    // validates the 64-bit collision argument on the full corpus: the
    // hashed inverted index must reproduce the string-set jaccards
    val t = graft.io.Tables(spark, sfDir)
    val hashed = Dedup.jaccardPairs(t.documents, col("doc_id"), col("text"),
        n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sh = Dedup.shingles(t.documents, col("doc_id"), col("text"), 3)
    val cnt = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val strPairs = sh.select(col("id").as("ia"), col("shingle"))
      .join(sh.select(col("id").as("ib"), col("shingle")), "shingle")
      .where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
      .join(cnt.select(col("id").as("ia"), col("n").as("na")), "ia")
      .join(cnt.select(col("id").as("ib"), col("n").as("nb")), "ib")
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .where(col("j") >= 0.5)
      .select("ia", "ib", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(hashed.keySet == strPairs.keySet)
    assert(hashed.forall { case (k, v) => math.abs(strPairs(k) - v) < 1e-15 })
  }
}
