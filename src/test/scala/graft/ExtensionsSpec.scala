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
        |       size(minhash_sig(hashed_shingles(array('a','b','c'), 2), 8)) AS k
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 8)
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
