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
}
