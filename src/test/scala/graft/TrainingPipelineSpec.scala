package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Dedup, TrainingPipeline}

class TrainingPipelineSpec extends GraftSuite {

  lazy val t = Tables(spark, sfDir)

  test("prepare filters, dedups, and keeps lineage columns") {
    val out = TrainingPipeline.prepare(t.documents, col("doc_id"),
      col("text"))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length < t.documents.count())
    // quality + language gates hold on every surviving row
    assert(rows.forall(_.getAs[Long]("n_tokens") >= 20))
    assert(rows.forall(r => Set("en", "es", "de", "fr")
      .contains(r.getAs[String]("lang_pred"))))
    // no surviving near-dup pairs at the configured threshold
    val pairs = Dedup.minhashLshPairs(out, col("id"), col("text"),
      n = 3, threshold = 0.8)
    assert(pairs.count() == 0)
    // no exact duplicates
    assert(out.select("text").distinct().count() == rows.length)
  }

  test("prepareDecontaminatedWith drops benchmark-overlapping survivors") {
    val s = spark; import s.implicits._
    // both docs pass the gates (>= 20 en tokens, stopwords present);
    // doc 1 is an exact copy of the bench doc → overlap 1.0 → dropped
    val leaked = "the cat sat on the mat and the dog ran to the " +
      "park of the town is a fine day for all of us"
    val clean = "a small bird flew over the river and the boat is " +
      "close to the shore of the lake where fish swim along"
    val train = Seq((1L, leaked), (2L, clean)).toDF("doc_id", "text")
    val bench = Seq((100L, leaked)).toDF("doc_id", "text")
    val out = TrainingPipeline.prepareDecontaminatedWith(
        train, col("doc_id"), col("text"), TrainingPipeline.Config(),
        bench = bench, benchId = col("doc_id"), benchText = col("text"),
        benchN = 5, maxOverlap = 0.5,
        (d, i, t) => Dedup.jaccardPairs(d, i, t, n = 3, threshold = 0.8))
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L))
    // sanity: without the decontamination gate both survive
    val prep = TrainingPipeline.prepareWith(
        train, col("doc_id"), col("text"), TrainingPipeline.Config(),
        (d, i, t) => Dedup.jaccardPairs(d, i, t, n = 3, threshold = 0.8))
      .select("id").as[Long].collect().toSet
    assert(prep == Set(1L, 2L))
    // the prebuilt-sketch per-batch form reproduces the exact gate
    // here (generous sizing → zero realized false positives), and the
    // same sketch serves repeated batches without a bench re-scan
    val sketch = graft.operators.Decontaminate.buildBenchSketch(
      bench, col("doc_id"), col("text"), n = 5, fpp = 1e-9)
    val viaSketch = TrainingPipeline.prepareDecontaminatedSketch(
        train, col("doc_id"), col("text"), TrainingPipeline.Config(),
        sketch, maxOverlap = 0.5,
        (d, i, t) => Dedup.jaccardPairs(d, i, t, n = 3, threshold = 0.8))
      .select("id").as[Long].collect().toSet
    assert(viaSketch == out)
  }
}
