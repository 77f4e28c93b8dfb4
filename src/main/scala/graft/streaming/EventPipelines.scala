package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CensusPipeline

/** Structured Streaming twins of the batch pipeline (SURVEY.md
  * §2-streaming): the same transformations declared over an unbounded
  * source, so a census that runs hourly as a batch job can run
  * continuously with identical semantics.
  *
  * Scale notes: both twins are watermarked, so state is bounded —
  * the hourly aggregation keeps |event_type| × (watermark/1h) open
  * windows per key, and the dedup keeps one entry per key inside the
  * watermark horizon. State is partitioned by group key across
  * executors exactly like a batch shuffle; nothing accumulates on the
  * driver.
  */
object EventPipelines {

  /** Streaming twin of `CensusPipeline.hourlyAgg` — same aggregate
    * expressions (shared `hourlyAggExprs`), tumbling 1-hour windows on
    * the event time, late data bounded by `watermark`. Output columns
    * match the batch twin: (event_type, hr, n, sum_value).
    */
  def streamHourlyCensus(events: DataFrame,
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(CensusPipeline.hourlyAggExprs.head,
        CensusPipeline.hourlyAggExprs.tail: _*)
      .select(col("event_type"), col("window.start").as("hr"),
        col("n"), col("sum_value"))

  /** Streaming twin of the unprocessed-file detection
    * (q_unprocessed_anti_join / file_cleanser.py:33-51): emit each key
    * once; duplicates arriving within the watermark horizon are
    * dropped, and state for keys older than the watermark is evicted.
    */
  def streamDedup(df: DataFrame, eventTimeCol: String, keys: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
