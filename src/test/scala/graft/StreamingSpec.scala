package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CensusPipeline
import graft.streaming.EventPipelines

class StreamingSpec extends GraftSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamHourlyCensus matches the batch twin on a replayed slice") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val rows = Seq(
      (ts("2026-01-01 10:05:00"), "a", 1.50),
      (ts("2026-01-01 10:55:00"), "a", 2.25),
      (ts("2026-01-01 11:05:00"), "a", 1.00),
      (ts("2026-01-01 10:10:00"), "b", 4.75))
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows: _*)
    val q = EventPipelines
      .streamHourlyCensus(mem.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("shc")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("shc")
      .orderBy("event_type", "hr").collect().toSeq
    val want = CensusPipeline
      .hourlyAgg(rows.toDF("ts", "event_type", "value"))
      .orderBy("event_type", "hr").collect().toSeq
    assert(got == want)
  }

  test("streamDedup emits each key once within the watermark") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData(
      (ts("2026-01-01 10:00:00"), "f1"),
      (ts("2026-01-01 10:00:30"), "f1"),
      (ts("2026-01-01 10:01:00"), "f2"),
      (ts("2026-01-01 10:02:00"), "f1"))
    val q = EventPipelines
      .streamDedup(mem.toDF.toDF("ts", "file_nm"), "ts", Seq("file_nm"))
      .writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val files = s.table("sd").select("file_nm").as[String].collect().sorted
    assert(files.toSeq == Seq("f1", "f2"))
  }
}
