package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityModel, Sketch}

/** Count-Min sketch contracts: the one-sided estimator (est >= true,
  * always), per-depth-row mass conservation, the merge == union
  * identity that makes the sketch a store/streaming artifact,
  * partition invariance, planted-heavy-hitter recall on BOTH hash
  * families, and exactness at collision-free width (where the whole
  * CMS surface must reproduce the exact twin frame bit-for-bit). */
class SketchSpec extends GraftSuite {
  import spark.implicits._

  private val hashFamilies = Seq(
    "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
    "seeded" -> QualityModel.seededKey)

  // 40 distinct words with counts 1..8 plus a null and an empty doc —
  // exact counts are enumerable by the same split the operator uses
  private def corpus = {
    val rows = (0 until 40).flatMap { i =>
      Seq.fill(i % 8 + 1)(s"w$i")
    }.grouped(7).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "))
    }.toSeq ++ Seq((900L, null.asInstanceOf[String]), (901L, ""))
    rows.toDF("doc_id", "text")
  }

  private def exactCounts = Sketch.heavyHittersExact(corpus, col("text"), 10000)
    .select("tok", "cnt").as[(String, Long)].collect().toMap

  test("estimates are one-sided (est >= true) at every width, both families") {
    val exact = exactCounts
    for ((fam, key) <- hashFamilies; width <- Seq(4, 64, 1 << 18)) {
      val cells = Sketch.countMinCells(corpus, col("text"),
        depth = 3, width = width, key)
      val est = Sketch.cmsEstimates(cells, corpus.select(
          explode(split(graft.io.Cleanser.normalized(col("text")), " "))
            .as("t")), col("t"), depth = 3, width = width, key)
        .as[(String, Long)].collect().toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"$fam width=$width: est(${t})=${est(t)} < $c")
      }
    }
  }

  test("each depth row conserves the total token mass") {
    val n = exactCounts.values.sum
    val perRow = Sketch.countMinCells(corpus, col("text"),
        depth = 4, width = 8, QualityModel.seededKey)
      .groupBy("j").agg(sum("cnt").as("mass"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.keySet == Set(0, 1, 2, 3))
    perRow.values.foreach(m => assert(m == n, s"row mass $m != $n"))
  }

  test("cmsMerge(cms(A), cms(B)) == cms(A union B), cell for cell") {
    val a = corpus.where(col("doc_id") % 2 === 0)
    val b = corpus.where(col("doc_id") % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMinCells(df, col("text"), depth = 4, width = 64)
    val merged = Sketch.cmsMerge(cells(a), cells(b))
      .as[(Int, Long, Long)].collect().sorted
    val whole = cells(corpus).as[(Int, Long, Long)].collect().sorted
    assert(merged.toSeq == whole.toSeq)
  }

  test("cells are partition-invariant") {
    def cells(p: Int) = Sketch.countMinCells(corpus.repartition(p),
        col("text"), depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(cells(1) == cells(7))
  }

  test("unseen probe tokens estimate 0 at collision-free width") {
    val cells = Sketch.countMinCells(corpus, col("text"),
      depth = 4, width = 1 << 18)
    val est = Sketch.cmsEstimates(cells,
        Seq("never-seen-a", "never-seen-b").toDF("t"), col("t"),
        depth = 4, width = 1 << 18)
      .as[(String, Long)].collect().toMap
    assert(est == Map("never-seen-a" -> 0L, "never-seen-b" -> 0L))
  }

  test("planted heavy hitter ranks first on both families") {
    val noise = (0 until 500).map(i => (i.toLong, s"n$i n${i + 500}"))
    val hot = (1000 until 1050).map(i =>
      (i.toLong, "hot hot hot hot"))
    val df = (noise ++ hot).toDF("doc_id", "text")
    for ((fam, key) <- hashFamilies) {
      val top = Sketch.cmsHeavyHitters(df, col("text"), k = 5,
          depth = 4, width = 1024, key)
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(top.head._2 == "hot", s"$fam top: ${top.head}")
      assert(top.head._3 >= 200L, s"$fam est ${top.head._3} < true 200")
    }
  }

  test("exact twin breaks count ties by token, ascending") {
    val df = Seq((0L, "b a c"), (1L, "c b a")).toDF("doc_id", "text")
    val top = Sketch.heavyHittersExact(df, col("text"), 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(top.map(_._2).toSeq == Seq("a", "b", "c"))
    assert(top.forall(_._3 == 2L))
  }

  test("at collision-free width the CMS surface reproduces the exact frame") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Sketch.heavyHittersExact(docs, col("text"), 50)
      .as[(Long, String, Long)].collect().toSeq
    for ((fam, key) <- hashFamilies) {
      val cms = Sketch.cmsHeavyHitters(docs, col("text"), k = 50,
          depth = 4, width = 1 << 18, key)
        .as[(Long, String, Long)].collect().toSeq
      assert(cms == exact, s"$fam diverged from the exact frame")
    }
  }
}
