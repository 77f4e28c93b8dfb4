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

  test("streamHourlyCensus equals the batch twin on the real events table") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val rows = graft.io.Tables(s, sfDir).events
      .selectExpr("unix_micros(ts)", "event_type", "value")
      .as[(Long, String, Double)].collect().toSeq
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows: _*)
    val stream = mem.toDF.toDF("us", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"),
        col("value"))
    val q = EventPipelines.streamHourlyCensus(stream)
      .writeStream.format("memory").queryName("shc_events")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("shc_events").collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2),
        r.getDouble(3))).toSet
    val want = CensusPipeline.hourlyAgg(graft.io.Tables(s, sfDir).events)
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want) // decimal-exact sums: no tolerance needed
  }

  test("sessionize emits the same sessions as the batch twin") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(s, sfDir)
    val rows = t.events.selectExpr("user_id", "unix_micros(ts)", "value")
      .as[(Long, Long, Double)].collect().toSeq
    val maxUs = rows.map(_._2).max
    val mem = MemoryStream[EventPipelines.SessionEvent]
    val evts = rows.map { case (u, us, v) =>
      EventPipelines.SessionEvent(u, EventPipelines.microsTs(us), v)
    }
    val q = EventPipelines
      .sessionize(mem.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(evts: _*)
      q.processAllAvailable()
      // sentinel batches: push the watermark far past every open
      // session so EventTimeTimeout flushes them
      val far = new Timestamp(maxUs / 1000L + 30L * 24 * 3600 * 1000)
      mem.addData(EventPipelines.SessionEvent(-1L, far, 0.0))
      q.processAllAvailable()
      mem.addData(EventPipelines.SessionEvent(-1L,
        new Timestamp(far.getTime + 3600_000L), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("sess").where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), math.round(r.getDouble(4) * 1e6)))
      .toSet
    val batchIn = evts.toDF()
    val want = EventPipelines.sessionizeBatch(
        batchIn.select(col("user_id"), col("ts"), col("value")), 60)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), math.round(r.getDouble(4) * 1e6)))
      .toSet
    assert(got.nonEmpty && got == want)
  }

  test("streamSessionStats: sessionize -> rollup chain equals the batch q166 rollup") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(s, sfDir)
    val rows = t.events.selectExpr("user_id", "unix_micros(ts)", "value")
      .as[(Long, Long, Double)].collect().toSeq
    val maxUs = rows.map(_._2).max
    val evts = rows.map { case (u, us, v) =>
      EventPipelines.SessionEvent(u, EventPipelines.microsTs(us), v) }
    val mem = MemoryStream[EventPipelines.SessionEvent]
    // update mode re-emits a user's totals each time a session
    // seals; the final snapshot per user is the rollup of record
    val snapshot = new java.util.concurrent.ConcurrentHashMap[Long,
      (Long, Long, Long, Double)]()
    // the rollup is a TOTAL aggregate (no watermark, nothing is
    // dropped as late), so Spark's conservative stateful-after-
    // stateful check is a false positive on this chain — disabled
    // scoped, per the operator's documented deployment note
    val ccKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val ccPrev = s.conf.getOption(ccKey)
    s.conf.set(ccKey, "false")
    val q = EventPipelines
      .streamSessionStats(EventPipelines.sessionize(mem.toDS(), 60))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => snapshot.put(r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      }.start()
    try {
      mem.addData(evts: _*)
      q.processAllAvailable()
      val far = new Timestamp(maxUs / 1000L + 30L * 24 * 3600 * 1000)
      mem.addData(EventPipelines.SessionEvent(-1L, far, 0.0))
      q.processAllAvailable()
      mem.addData(EventPipelines.SessionEvent(-1L,
        new Timestamp(far.getTime + 3600_000L), 0.0))
      q.processAllAvailable()
    } finally {
      q.stop()
      ccPrev match {
        case Some(v) => s.conf.set(ccKey, v)
        case None => s.conf.unset(ccKey)
      }
    }
    val want = EventPipelines
      .streamSessionStats(
        EventPipelines.sessionizeBatch(
            evts.toDF().select(col("user_id"), col("ts"), col("value")), 60)
          .select(col("user_id"), col("session_start"),
            col("session_end"), col("n_events"), col("sum_value"))
          .as[EventPipelines.UserSession])
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    import scala.jdk.CollectionConverters._
    val got = snapshot.asScala.toMap.filter(_._1 >= 0)
    assert(got.nonEmpty && got == want)
  }

  test("sessionizeWindows emits final gap sessions via session_window") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = EventPipelines.sessionizeWindows(
        mem.toDF.toDF("user_id", "ts", "value"), gapMinutes = 60)
      .writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01 10:00:00"), 1.0),
        (1L, ts("2026-01-01 10:30:00"), 2.0),
        (1L, ts("2026-01-01 13:00:00"), 3.0),
        (2L, ts("2026-01-01 11:00:00"), 4.0))
      q.processAllAvailable()
      mem.addData((99L, ts("2026-02-01 00:00:00"), 0.0)) // watermark flush
      q.processAllAvailable()
      mem.addData((99L, ts("2026-02-01 02:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("sw").where(col("user_id") < 99)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("streamTokenBudget equals takeByBudgetPerKey on a replayed slice") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    // weights chosen so every key hits its budget mid-sequence,
    // including an exact-budget admit ("es") and a giant doc that
    // closes the key while later small docs still arrive ("de")
    val docs = Seq(
      EventPipelines.BudgetDoc("en", 1L, 4L), EventPipelines.BudgetDoc("en", 2L, 5L),
      EventPipelines.BudgetDoc("en", 3L, 2L), EventPipelines.BudgetDoc("es", 1L, 10L),
      EventPipelines.BudgetDoc("es", 2L, 1L), EventPipelines.BudgetDoc("de", 1L, 2L),
      EventPipelines.BudgetDoc("de", 2L, 50L), EventPipelines.BudgetDoc("de", 3L, 1L))
    val mem = MemoryStream[EventPipelines.BudgetDoc]
    mem.addData(docs: _*)
    val q = EventPipelines.streamTokenBudget(mem.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("stb")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("stb")
      .as[EventPipelines.AdmittedDoc].collect()
      .map(a => (a.key, a.order, a.weight, a.cum_weight)).toSet
    val want = graft.etl.Batching.takeByBudgetPerKey(
        docs.toDF("key", "order", "weight"), key = col("key"),
        order = col("order"), weight = col("weight"), budget = 10L,
        partitions = 4)
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, o, w, c) => (k, o, w, c) }.toSet
    assert(want.nonEmpty && got == want)
    // the en doc after the overflow stays dropped (prefix semantics)
    assert(!got.exists(r => r._1 == "en" && r._2 == 3L))
  }

  test("streaming decontamination gate equals the batch rollup") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e f g h"),  // exact copy
      (2L, "p q r s t u v w"),  // clean
      (3L, "x y a b c d e z"),  // partial overlap
      (4L, "t u"))              // too short to shingle: absent both sides
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = graft.operators.Decontaminate.overlapStatsStateless(
        mem.toDF().toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("decon")
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val want = graft.operators.Decontaminate.overlapStats(
        docs.toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(want.size == 3 && got == want)
  }

  test("streaming BLOOM decontamination gate equals the batch exact rollup") {
    // generously-sized sketch (fpp 1e-6 over 6 bench shingles) -> no
    // realized false positives on this fixed corpus, so the streaming
    // sketch gate must equal the batch EXACT gate; the sketch is built
    // from the static bench side before the stream starts
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q r s t u v w"),
      (3L, "x y a b c d e z"),
      (4L, "t u"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = graft.operators.Decontaminate.overlapStatsBloomStateless(
        mem.toDF().toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), n = 3, threshold = 0.5, fpp = 1e-6)
      .writeStream.format("memory").queryName("decon_bloom")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("decon_bloom")
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val want = graft.operators.Decontaminate.overlapStats(
        docs.toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(want.size == 3 && got == want)
  }

  test("quality-model scoring runs unchanged on a stream, equal to batch") {
    // QualityModel.score is scan-projection algebra (spec-asserted
    // zero-shuffle batch plan), so the SAME code path gates a stream
    // with no stateful operators at all — the property every
    // per-document gate in this library aims for
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "completely different words here"),
      (3L, "the the the the"), (4L, "x"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = graft.operators.QualityModel.score(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), dim = 512)
      .writeStream.format("memory").queryName("qm_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("qm_stream")
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val want = graft.operators.QualityModel.score(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        dim = 512)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(want.size == 4 && got == want)
  }

  test("gopher rule battery runs unchanged on a stream, equal to batch") {
    // gopherRules is zero-Exchange in-row scan algebra (plan-asserted
    // in LmQualitySpec), so the same battery gates a stream with no
    // stateful operators
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Seq(
      (1L, ("the data " * 20).trim),
      (2L, "too short"),
      (3L, "the and " + ("# " * 40)),
      (4L, null.asInstanceOf[String]))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = graft.operators.QualityRules.gopherRules(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), minWords = 30, minStopHits = 1)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = graft.operators.QualityRules.gopherRules(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
      minWords = 30, minStopHits = 1)
    assert(canon(s.table("gopher_stream")) == canon(want))
    assert(want.count() == 4)
  }

  test("LM scoring gates a stream through a static count table (stream-static join), equal to batch") {
    // the n-gram LM's scoring join is stream-static: the count
    // tables are a bounded trained artifact, the document stream is
    // unbounded — Structured Streaming's supported shape, so CCNet
    // perplexity filtering runs on an ingest stream unchanged
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val bg = graft.operators.LanguageModel.bigramCounts(
      ref, col("doc_id"), col("text")).localCheckpoint(true)
    val ug = graft.operators.LanguageModel.unigramCounts(
      ref, col("doc_id"), col("text")).localCheckpoint(true)
    val docs = Seq((10L, "a b c d"), (11L, "x y z"), (12L, "a b a b"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.take(2): _*)
    mem.addData(docs.drop(2): _*)
    val q = graft.operators.LanguageModel.scoreCounts(
        mem.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"),
        bg, ug)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("lm_stream")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.LanguageModel.scoreCounts(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"), bg, ug)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.size == 3 && got == want)
  }

  test("Platt-calibrated probability gate runs unchanged on a stream, equal to batch") {
    // withProbability is one column expression over the zero-shuffle
    // scoring plan, so calibrated-probability gating needs no
    // streaming-specific code either
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "completely different words here"),
      (3L, "the the the the"), (4L, "x"))
    val (a, b) = (-2.5, 0.3) // fitted upstream; any coefficients
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = graft.operators.QualityModel.withProbability(
        graft.operators.QualityModel.score(
          mem.toDF().toDF("doc_id", "text"),
          col("doc_id"), col("text"), dim = 512), a, b)
      .select(col("id"), col("score"), col("prob"))
      .writeStream.format("memory").queryName("qm_prob_stream")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("qm_prob_stream")
      .as[(Long, Double, Double)].collect().toSet
    val want = graft.operators.QualityModel.withProbability(
        graft.operators.QualityModel.score(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
          dim = 512), a, b)
      .select(col("id"), col("score"), col("prob"))
      .as[(Long, Double, Double)].collect().toSet
    assert(want.size == 4 && got == want)
    // derived-weight margins saturate the sigmoid (scores reach
    // ±1000), so probabilities may sit exactly at the closed ends
    assert(want.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 })
  }

  test("media header decode runs unchanged on a stream, equal to batch") {
    // decodeAudio/decodeVideo are mapPartitions scan algebra — per-
    // record decode, no state, no shuffle — so the daily media-ingest
    // batch and its streaming form are the SAME operator, exactly like
    // the quality gate above: nothing to re-prove per round, the spec
    // pins it once. Payloads are real containers (javax.sound WAV/
    // AIFF, a hand-built ISO-BMFF moov), not stub bytes.
    implicit val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    def audioBytes(tpe: AudioFileFormat.Type, rate: Float,
                   channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(
          new Array[Byte](frames * fmt.getFrameSize)), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    def u32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512)) ++
      box("moov",
        box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++
          u32(1800) ++ new Array[Byte](80)) ++
        box("trak", box("tkhd", new Array[Byte](76) ++
          u32(640L << 16) ++ u32(360L << 16))))
    val audio = Seq(
      (1L, audioBytes(AudioFileFormat.Type.WAVE, 8000f, 1, 16000)),
      (2L, audioBytes(AudioFileFormat.Type.AIFF, 44100f, 2, 44100)),
      (3L, "not audio at all, honestly".getBytes("UTF-8")))
    val video = Seq(
      (1L, mp4),
      (2L, "and this is not a video either".getBytes("UTF-8")))

    val audioBatch = graft.operators.Multimodal
      .decodeAudio(audio.toDF("doc_id", "payload"))
    val videoBatch = graft.operators.Multimodal
      .decodeVideo(video.toDF("doc_id", "payload"))
    // the property that makes stream == batch nearly free: zero
    // Exchange in the executed batch plan
    audioBatch.collect(); videoBatch.collect()
    assert(!audioBatch.queryExecution.executedPlan.toString
      .contains("Exchange"))
    assert(!videoBatch.queryExecution.executedPlan.toString
      .contains("Exchange"))

    val memA = MemoryStream[(Long, Array[Byte])]
    memA.addData(audio.take(2)); memA.addData(audio.drop(2))
    val qa = graft.operators.Multimodal
      .decodeAudio(memA.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("audio_stream")
      .outputMode("append").start()
    try qa.processAllAvailable() finally qa.stop()
    assert(s.table("audio_stream")
        .as[graft.operators.Multimodal.AudioMeta].collect().toSet ==
      audioBatch.collect().toSet)

    val memV = MemoryStream[(Long, Array[Byte])]
    memV.addData(video)
    val qv = graft.operators.Multimodal
      .decodeVideo(memV.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("video_stream")
      .outputMode("append").start()
    try qv.processAllAvailable() finally qv.stop()
    assert(s.table("video_stream")
        .as[graft.operators.Multimodal.VideoMeta].collect().toSet ==
      videoBatch.collect().toSet)
  }

  test("stateless IVF assignment == batch max_by form, zero Exchange, stream-ready") {
    // ivfAssignStateless binds the frozen centroid layout into the
    // plan (planeDots matrix + two literals) so daily-vector streams
    // assign with no stateful operator — the IVF analog of the
    // quality-model gate above
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val emb = graft.io.Tables(spark, sfDir).embeddings
      .where(graft.functions.VectorFns.l2Norm(col("embedding")) > 0)
    val cents = graft.operators.Similarity.ivfCentroids(
      emb, numCentroids = 8, lloydIters = 1)
    val batch = graft.operators.Similarity.ivfAssignments(emb, cents)
      .select("n_id", "c_id", "nc").as[(Long, Long, Double)]
      .collect().toSet
    val flat = graft.operators.Similarity.ivfAssignStateless(emb, cents)
    val got = flat.select("n_id", "c_id", "nc").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == batch && got.nonEmpty)
    // the whole point: scan algebra, not one Exchange in the plan
    assert(!flat.queryExecution.executedPlan.toString.contains("Exchange"))
    // MemoryStream replay in two batches — same rows out
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(rows.take(rows.length / 2).toIndexedSeq)
    mem.addData(rows.drop(rows.length / 2).toIndexedSeq)
    val q = graft.operators.Similarity.ivfAssignStateless(
        mem.toDF().toDF("vec_id", "embedding"), cents)
      .select("n_id", "c_id", "nc")
      .writeStream.format("memory").queryName("ivf_assign_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table("ivf_assign_stream")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == got)
  }

  test("streamNearDupPairs == incrementalLshPairs replay, batch by batch") {
    // the r6 verdict's in-stream-state ask: over any batch sequence
    // with no eviction, the stream's emitted pair SET must equal
    // replaying the batch incremental generator with each batch as
    // the new side and all earlier batches as the reference corpus
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(spark, sfDir)
    val (nh, nb, thr) = (32, 8, 0.5)
    val corpus = graft.operators.Dedup.minhashSignatures(
        t.documents, col("doc_id"), col("text"), n = 3, numHashes = nh)
      .as[(Long, Seq[Long])].collect()
    // three "daily" batches; planted signature copies guarantee both
    // pair families are non-vacuous: 1000001 (batch 1) copies a batch-0
    // doc → cross-batch pair; 1000002/1000003 (both batch 2) copy one
    // batch-2 doc → in-batch pair
    val byBatch = corpus.groupBy(_._1 % 3)
    val donorA = byBatch(0L).head
    val donorB = byBatch(2L).head
    val batches: Seq[Seq[(Long, Seq[Long])]] = Seq(
      byBatch(0L).toSeq,
      byBatch(1L).toSeq :+ ((1000001L, donorA._2)),
      byBatch(2L).toSeq :+ ((1000002L, donorB._2)) :+ ((1000003L, donorB._2)))
    val mem = MemoryStream[EventPipelines.SigEvent]
    val q = EventPipelines.streamNearDupPairs(mem.toDS(),
        numHashes = nh, bands = nb, threshold = thr,
        watermark = "3650 days", evictAfterMs = 1000L * 3600 * 24 * 3650,
        maxBucketSize = 100000)
      .writeStream.format("memory").queryName("snd")
      .outputMode("append").start()
    try {
      batches.zipWithIndex.foreach { case (b, k) =>
        mem.addData(b.map { case (id, sg) =>
          EventPipelines.SigEvent(id,
            new Timestamp(3600L * 1000 * (k + 1)), sg) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = s.table("snd").as[EventPipelines.StreamPair].collect()
      .map(p => (p.id_a, p.id_b, p.est_jaccard)).toSet
    def sigDf(xs: Seq[(Long, Seq[Long])]) = xs.toDF("id", "sig")
    val want = batches.indices.flatMap { k =>
      graft.operators.Dedup.incrementalLshPairs(
          newSigs = sigDf(batches(k)),
          refSigs = sigDf(batches.take(k).flatten),
          numHashes = nh, bands = nb, threshold = thr)
        .as[(Long, Long, Double)].collect()
    }.toSet
    assert(want.nonEmpty && got == want)
    // both planted families really occurred
    assert(want.exists { case (a, b, _) => a == donorA._1 && b == 1000001L })
    assert(want.exists { case (a, b, _) => a == 1000002L && b == 1000003L })
  }

  test("streamRepeatedSpans == perDocRepeatedSpans; invariant under micro-batch boundaries") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(spark, sfDir)
    val passage = (1 to 14).map(i => s"sp$i").mkString(" ")
    val crossDoc = "cn1 " + passage + " cn2"            // dup vs ref
    val refPlant = Seq((940002L * 3, "rr0 " + passage + " rr9"))
    val selfRep = ((1 to 10).map(i => s"sr$i") ++ Seq("gap1", "gap2") ++
      (1 to 10).map(i => s"sr$i")).mkString(" ")         // within-doc dup
    // two stream docs sharing a passage ABSENT from the store: the
    // per-doc gate must NOT flag them (batch-mates are invisible)
    val mate = (1 to 12).map(i => s"mm$i").mkString(" ")
    val docs = t.documents.select(col("doc_id"), col("text"))
    val refCounts = graft.operators.Dedup.gramCounts(
      docs.where(col("doc_id") % 3 === 0)
        .unionByName(refPlant.toDF("doc_id", "text")),
      col("doc_id"), col("text"), minRun = 10)
    val streamRows = docs.where(col("doc_id") % 3 =!= 0)
      .as[(Long, String)].collect().toSeq ++ Seq(
      (940001L, crossDoc), (940004L, selfRep),
      (940007L, "ma1 " + mate), (940010L, mate + " mb1 mb2"))
    val mem = MemoryStream[EventPipelines.DocEvent]
    val q = EventPipelines.streamRepeatedSpans(mem.toDS(), refCounts,
        minRun = 10, watermark = "3650 days",
        evictAfterMs = 1000L * 3600 * 24 * 3650)
      .writeStream.format("memory").queryName("srs")
      .outputMode("append").start()
    try {
      // two arbitrary micro-batches: the split point must not matter
      val (b1, b2) = streamRows.splitAt(streamRows.size / 3)
      Seq(b1, b2).zipWithIndex.foreach { case (b, k) =>
        mem.addData(b.map { case (id, tx) =>
          EventPipelines.DocEvent(id,
            new Timestamp(3600L * 1000 * (k + 1)), tx) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = s.table("srs").as[EventPipelines.DocSpan].collect()
      .map(d => (d.id, d.span_start, d.span_end, d.span_tokens)).toSet
    val want = graft.operators.Dedup.perDocRepeatedSpans(
        streamRows.toDF("doc_id", "text"), refCounts,
        col("doc_id"), col("text"), minRun = 10)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got.nonEmpty && got == want,
      s"stream diverged from perDoc batch: ${got.size} vs ${want.size}")
    // the plants behave per the gate's contract
    assert(got.contains((940001L, 1, 14, 14)), "cross-side span missed")
    assert(got.exists(_._1 == 940004L), "self-repeat missed")
    assert(!got.exists(d => d._1 == 940007L || d._1 == 940010L),
      "batch-mates must be invisible to the per-doc gate")
    // ...while the batch-wide increment DOES see them — the
    // documented trade between the two forms
    val batchWide = graft.operators.Dedup.incrementalRepeatedSpans(
        streamRows.toDF("doc_id", "text"), refCounts,
        col("doc_id"), col("text"), minRun = 10)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(batchWide.exists(_._1 == 940007L) &&
      batchWide.exists(_._1 == 940010L))
    assert((got -- batchWide).isEmpty,
      "per-doc spans must be a subset of the batch-wide increment")
  }

  test("streamSoftDedupWeights == perDocSoftDedupWeights; invariant under micro-batch boundaries") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(spark, sfDir)
    val passage = (1 to 14).map(i => s"sw$i").mkString(" ")
    val refPlant = Seq((970002L * 3, "rw0 " + passage + " rw9"))
    val selfRep = ((1 to 10).map(i => s"wr$i") ++ Seq("gap1", "gap2") ++
      (1 to 10).map(i => s"wr$i")).mkString(" ")
    // two stream docs sharing a passage absent from the store: the
    // per-doc weights must NOT see it (batch-mates invisible)
    val mate = (1 to 12).map(i => s"wm$i").mkString(" ")
    val docs = t.documents.select(col("doc_id"), col("text"))
    val refCounts = graft.operators.Dedup.gramCounts(
      docs.where(col("doc_id") % 3 === 0)
        .unionByName(refPlant.toDF("doc_id", "text")),
      col("doc_id"), col("text"), minRun = 10)
    val streamRows = docs.where(col("doc_id") % 3 =!= 0)
      .as[(Long, String)].collect().toSeq ++ Seq(
      (970001L, "wn1 " + passage + " wn2 wn3"), (970004L, selfRep),
      (970007L, "wa1 " + mate), (970010L, mate + " wb1 wb2"))
    val mem = MemoryStream[EventPipelines.DocEvent]
    val q = EventPipelines.streamSoftDedupWeights(mem.toDS(), refCounts,
        minRun = 10, lambda = 4.0, watermark = "3650 days",
        evictAfterMs = 1000L * 3600 * 24 * 3650)
      .writeStream.format("memory").queryName("ssw")
      .outputMode("append").start()
    try {
      val (b1, b2) = streamRows.splitAt(streamRows.size / 3)
      Seq(b1, b2).zipWithIndex.foreach { case (b, k) =>
        mem.addData(b.map { case (id, tx) =>
          EventPipelines.DocEvent(id,
            new Timestamp(3600L * 1000 * (k + 1)), tx) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = s.table("ssw").as[EventPipelines.DocSoftWeight].collect()
      .map(d => (d.id, d.n_grams, d.n_dup, d.dup_mass, d.dup_ratio,
        d.weight)).toSet
    val want = graft.operators.Dedup.perDocSoftDedupWeights(
        streamRows.toDF("doc_id", "text"), refCounts,
        col("doc_id"), col("text"), minRun = 10, lambda = 4.0)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got.nonEmpty && got == want,
      s"stream diverged from perDoc batch: ${got.size} vs ${want.size}")
    // contract plants: cross-side dup weighted down via the store,
    // self-repeat weighted down storelessly, batch-mates invisible
    assert(got.exists(d => d._1 == 970001L && d._3 > 0),
      "cross-side dup missed")
    assert(got.exists(d => d._1 == 970004L && d._3 > 0),
      "self-repeat missed")
    assert(got.exists(d => d._1 == 970007L && d._3 == 0 && d._6 == 1.0) &&
      got.exists(d => d._1 == 970010L && d._3 == 0 && d._6 == 1.0),
      "batch-mates must be invisible to the per-doc weights")
  }

  test("streamNearDupPairs: idle buckets evict past the horizon") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val dup = Seq.tabulate(32)(i => 7L * i + 3)
    def noise(seed: Long) = Seq.tabulate(32)(i => seed * 1000003L + i)
    val mem = MemoryStream[EventPipelines.SigEvent]
    val q = EventPipelines.streamNearDupPairs(mem.toDS(),
        numHashes = 32, bands = 8, threshold = 0.5,
        watermark = "1 second", evictAfterMs = 1000L)
      .writeStream.format("memory").queryName("snd_evict")
      .outputMode("append").start()
    def at(minutes: Long) = new Timestamp(minutes * 60000L)
    try {
      mem.addData(EventPipelines.SigEvent(1L, at(0), dup))
      q.processAllAvailable()
      // unrelated traffic advances the watermark far past doc 1's
      // bucket timeout...
      mem.addData(EventPipelines.SigEvent(99L, at(60), noise(99)))
      q.processAllAvailable()
      // ...and the NEXT batch fires the idle bucket's timeout (a
      // bucket receiving events in a batch is not "idle" — eviction
      // happens on a trigger where it gets none)
      mem.addData(EventPipelines.SigEvent(98L, at(61), noise(98)))
      q.processAllAvailable()
      // doc 1's state is gone: an exact signature copy is NOT flagged
      mem.addData(EventPipelines.SigEvent(2L, at(120), dup))
      q.processAllAvailable()
      // but fresh state works: the next copy pairs with doc 2
      mem.addData(EventPipelines.SigEvent(3L, at(121), dup))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("snd_evict").as[EventPipelines.StreamPair].collect()
      .map(p => (p.id_a, p.id_b)).toSet
    assert(!got.exists(_._1 == 1L), s"evicted doc 1 still flagged: $got")
    assert(got.contains((2L, 3L)))
  }

  test("streamTokenBudget: a closed key admits nothing in later batches") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[EventPipelines.BudgetDoc]
    val q = EventPipelines.streamTokenBudget(mem.toDS(), budget = 5L)
      .writeStream.format("memory").queryName("stb2")
      .outputMode("append").start()
    try {
      mem.addData(EventPipelines.BudgetDoc("en", 1L, 6L)) // overflows at once
      q.processAllAvailable()
      mem.addData(EventPipelines.BudgetDoc("en", 2L, 1L)) // would fit a fresh key
      mem.addData(EventPipelines.BudgetDoc("fr", 1L, 1L))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("stb2").as[EventPipelines.AdmittedDoc].collect()
      .map(a => (a.key, a.order, a.cum_weight)).toSet
    assert(got == Set(("fr", 1L, 1L)))
  }

  test("streamCmsCells == batch sketch over the union; invariant under micro-batch boundaries") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val batch1 = Seq((0L, "the cat sat on the mat"), (1L, "the dog"),
      (2L, null.asInstanceOf[String]))
    val batch2 = Seq((3L, "the cat returned"), (4L, ""))
    for ((fam, key) <- Seq(
        "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
        "seeded" -> graft.operators.QualityModel.seededKey)) {
      val mem = MemoryStream[(Long, String)]
      val q = EventPipelines.streamCmsCells(
          mem.toDF.toDF("doc_id", "text"), col("text"),
          depth = 3, width = 16, hashKey = key)
        .writeStream.format("memory").queryName(s"scms_$fam")
        .outputMode("complete").start()
      try {
        mem.addData(batch1: _*); q.processAllAvailable()
        // after batch 1: equals the batch sketch over batch 1 alone
        val mid = s.table(s"scms_$fam").as[(Int, Long, Long)].collect().toSet
        val midWant = graft.operators.Sketch.countMinCells(
            batch1.toDF("doc_id", "text"), col("text"), 3, 16, key)
          .as[(Int, Long, Long)].collect().toSet
        assert(mid == midWant, s"$fam mid-stream")
        mem.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
      // after both: equals the one-shot batch sketch on the union —
      // the cmsMerge SUM identity riding the streaming aggregate
      val got = s.table(s"scms_$fam").as[(Int, Long, Long)].collect().toSet
      val want = graft.operators.Sketch.countMinCells(
          (batch1 ++ batch2).toDF("doc_id", "text"), col("text"), 3, 16, key)
        .as[(Int, Long, Long)].collect().toSet
      assert(got == want, s"$fam final")
    }
  }

  test("streamHllRegisters == batch sketch; replayed (at-least-once) docs cannot move a register") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val batch1 = Seq((0L, "alpha beta gamma delta"), (1L, "epsilon zeta"))
    val batch2 = Seq((0L, "alpha beta gamma delta"),  // doc 0 REPLAYED
      (2L, "eta theta"), (3L, null.asInstanceOf[String]))
    for ((fam, key) <- Seq(
        "xxhash64" -> ((c: org.apache.spark.sql.Column) => xxhash64(c)),
        "seeded" -> graft.operators.QualityModel.seededKey)) {
      val mem = MemoryStream[(Long, String)]
      val q = EventPipelines.streamHllRegisters(
          mem.toDF.toDF("doc_id", "text"), col("text"), m = 64, hashKey = key)
        .writeStream.format("memory").queryName(s"shll_$fam")
        .outputMode("complete").start()
      try {
        mem.addData(batch1: _*); q.processAllAvailable()
        mem.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
      val got = s.table(s"shll_$fam").as[(Long, Int)].collect().toSet
      // max-idempotence: the replayed doc 0 contributes nothing new —
      // stream state == one-shot batch over the DEDUPLICATED union
      val want = graft.operators.Hll.tokenRegisters(
          (batch1 ++ batch2).distinct.toDF("doc_id", "text"), col("text"),
          64, key)
        .as[(Long, Int)].collect().toSet
      assert(got == want, s"$fam")
    }
  }

  test("streamHdrFrame == batch histogram over the union; quantiles read off the sink") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val batch1 = Seq((0L, "the cat sat on the mat"), (1L, "the dog"),
      (2L, null.asInstanceOf[String]))
    val batch2 = Seq((3L, "the cat returned home today again"), (4L, ""),
      (5L, "one two three four five six seven eight nine ten" * 8))
    val mem = MemoryStream[(Long, String)]
    val q = EventPipelines.streamHdrFrame(
        mem.toDF.toDF("doc_id", "text"), col("text"), b = 3)
      .writeStream.format("memory").queryName("shdr")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      // after batch 1: equals the batch frame over batch 1 alone
      val mid = s.table("shdr").as[(Long, Long, Long, Long)].collect().toSet
      val midWant = graft.operators.Hdr.tokenLengthFrame(
          batch1.toDF("doc_id", "text"), col("text"), b = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(mid == midWant, "mid-stream")
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    // after both: equals the one-shot batch frame on the union — the
    // Hdr.merge SUM identity riding the streaming aggregate; and the
    // quantile read path runs on the materialized sink table itself
    val got = s.table("shdr").as[(Long, Long, Long, Long)].collect().toSet
    val union = (batch1 ++ batch2).toDF("doc_id", "text")
    val want = graft.operators.Hdr.tokenLengthFrame(union, col("text"), b = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, "final")
    val qsGot = graft.operators.Hdr.quantiles(s.table("shdr"), Seq(0.5, 0.99))
      .as[(Double, Long, Long)].collect().toSet
    val qsWant = graft.operators.Hdr.tokenLengthQuantiles(
        union, col("text"), Seq(0.5, 0.99), b = 3)
      .as[(Double, Long, Long)].collect().toSet
    assert(qsGot == qsWant, "quantiles off the sink")
  }

  test("streamAsofScd2 == batch containment join under an arbitrary micro-batch split") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val changes = Seq(
      (1L, 7L, ts("2026-01-01 00:00:00"), "bronze"),
      (2L, 7L, ts("2026-01-01 02:00:00"), "silver"),
      (3L, 7L, ts("2026-01-01 04:00:00"), "gold"),
      (4L, 8L, ts("2026-01-01 01:00:00"), "bronze"))
      .toDF("change_id", "user_id", "ts", "tier")
    val dim = graft.etl.Scd.buildType2(changes, Seq("user_id"),
      col("ts"), col("change_id"), Seq("tier"))
    val batch1 = Seq( // before any interval -> null tier
      (100L, 7L, ts("2025-12-31 23:00:00")),
      (101L, 7L, ts("2026-01-01 00:00:00"))) // boundary: inclusive from
    val batch2 = Seq(
      (102L, 7L, ts("2026-01-01 03:59:59")), // last instant of silver
      (103L, 7L, ts("2026-01-01 10:00:00")), // open interval
      (104L, 8L, ts("2026-01-01 01:00:00")),
      (105L, 9L, ts("2026-01-01 01:00:00"))) // unknown key -> null
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventPipelines.streamAsofScd2(
        mem.toDF.toDF("event_id", "user_id", "ts"), dim,
        Seq("user_id"), "ts", Seq("tier"))
      .writeStream.format("memory").queryName("sascd")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = s.table("sascd").as[(Long, Long, Timestamp, Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    val want = EventPipelines.streamAsofScd2(
        (batch1 ++ batch2).toDF("event_id", "user_id", "ts"), dim,
        Seq("user_id"), "ts", Seq("tier"))
      .as[(Long, Long, Timestamp, Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(got == want)
    assert(got == Map(100L -> None, 101L -> Some("bronze"),
      102L -> Some("silver"), 103L -> Some("gold"),
      104L -> Some("bronze"), 105L -> None))
  }

  test("streamFunnelDepth: max emitted depth == batch funnelDepth under in-order delivery") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val stages = Seq("signup", "click", "purchase")
    // u1 progresses across BATCHES; u2's same-ts signup+click land in
    // one batch (sorted by stage index -> both count, the inclusive
    // boundary); u3's click arrives before its signup (no progress
    // until a later click); u4 only views (never enters)
    val batch1 = Seq(
      EventPipelines.FunnelEvent(1L, ts("2026-01-01 10:00:00"), "signup"),
      EventPipelines.FunnelEvent(2L, ts("2026-01-01 10:00:00"), "click"),
      EventPipelines.FunnelEvent(2L, ts("2026-01-01 10:00:00"), "signup"),
      EventPipelines.FunnelEvent(3L, ts("2026-01-01 09:00:00"), "click"),
      EventPipelines.FunnelEvent(4L, ts("2026-01-01 09:00:00"), "view"))
    // u5/u6: MICROSECOND boundaries inside one millisecond — u5's
    // click is 1 µs BEFORE its signup (same milli: a millis-grained
    // gate would wrongly admit it via >=), u6's click 1 µs after
    // (must advance). Pins the tsMicros precision of the stage gate.
    def us(base: String, plus: Long) = EventPipelines.microsTs(
      EventPipelines.tsMicros(ts(base)) + plus)
    val batch2 = Seq(
      EventPipelines.FunnelEvent(1L, ts("2026-01-01 11:00:00"), "click"),
      EventPipelines.FunnelEvent(1L, ts("2026-01-01 12:00:00"), "purchase"),
      EventPipelines.FunnelEvent(3L, ts("2026-01-01 10:00:00"), "signup"),
      EventPipelines.FunnelEvent(3L, ts("2026-01-01 11:00:00"), "click"),
      EventPipelines.FunnelEvent(5L, us("2026-01-01 10:00:00", 100), "signup"),
      EventPipelines.FunnelEvent(5L, us("2026-01-01 10:00:00", 99), "click"),
      EventPipelines.FunnelEvent(6L, us("2026-01-01 10:00:00", 100), "signup"),
      EventPipelines.FunnelEvent(6L, us("2026-01-01 10:00:00", 101), "click"))
    val mem = MemoryStream[EventPipelines.FunnelEvent]
    val q = EventPipelines.streamFunnelDepth(mem.toDS(), stages)
      .writeStream.format("memory").queryName("sfun")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = s.table("sfun").as[EventPipelines.FunnelProgress].collect()
    // progress rows are monotone per user, one per depth step
    val byUser = got.groupBy(_.user_id)
    byUser.values.foreach { rows =>
      val ds = rows.map(_.stages_completed).sorted
      assert(ds.sameElements(1L to ds.max), s"non-contiguous: ${ds.toSeq}")
    }
    val maxDepth = byUser.view.mapValues(_.map(_.stages_completed).max).toMap
    val batchDepth = graft.operators.EventAnalytics.funnelDepth(
        (batch1 ++ batch2).map(e => (e.user_id, e.event_type, e.ts))
          .toDF("user_id", "event_type", "ts"),
        "user_id", col("ts"), col("event_type"), stages)
      .as[(Long, Long)].collect().toMap
    assert(maxDepth == batchDepth)
    assert(maxDepth == Map(1L -> 3L, 2L -> 2L, 3L -> 2L,
      5L -> 1L, 6L -> 2L))
  }

  test("streamOhlcHourly == batch bars on null-free values, invariant under micro-batch split") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val batch1 = Seq(
      (2L, "a", ts("2026-01-01 00:10:00"), 7.0),
      (1L, "a", ts("2026-01-01 00:50:00"), 3.5),
      (3L, "a", ts("2026-01-01 00:10:00"), 9.0)) // equal-ts tie: id 2 < 3
    val batch2 = Seq(
      (4L, "a", ts("2026-01-01 01:30:00"), 9.25),
      (5L, "b", ts("2026-01-01 00:20:00"), 2.0))
    val mem = MemoryStream[(Long, String, Timestamp, Double)]
    val q = EventPipelines.streamOhlcHourly(
        mem.toDF.toDF("event_id", "event_type", "ts", "value"),
        Seq("event_type"), "ts", col("value"), col("event_id"))
      .writeStream.format("memory").queryName("sohlc")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = s.table("sohlc")
      .as[(String, Timestamp, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    val want = graft.operators.TimeSeries.downsampleOhlc(
        (batch1 ++ batch2).toDF("event_id", "event_type", "ts", "value"),
        Seq("event_type"), col("ts"), col("value"), col("event_id"))
      .select("event_type", "bucket", "open", "high", "low", "close",
        "n_events", "sum_value")
      .as[(String, Timestamp, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    assert(got == want)
    // the equal-ts tie: open of a/00:00 is id 2's 7.0, not id 3's 9.0
    assert(got.exists(r => r._1 == "a" && r._3 == 7.0 && r._6 == 3.5))
  }

  test("streamAsofTagged equals batch asof under arbitrary micro-batch splits") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val t = graft.io.Tables(s, sfDir)
    // derive two fact streams from the events table: every third
    // event is a "right" (quote) row, the rest are "left" probes
    val ev = t.events.select(col("user_id"), col("ts"), col("event_id"),
        col("value")).collect().map(r =>
      (r.getLong(0), r.getAs[Timestamp](1), r.getLong(2), r.getDouble(3)))
    val rightRows = ev.filter(_._3 % 3 == 0)
    val leftRows = ev.filter(_._3 % 3 != 0)
    // per-key event-time-ordered delivery ACROSS sides (the
    // documented contract): one globally time-sorted tagged stream,
    // split at arbitrary points into micro-batches
    val tagged = (leftRows.map(e =>
        EventPipelines.AsofUnion(e._1, e._2, 1, e._3, None)) ++
      rightRows.map(e =>
        EventPipelines.AsofUnion(e._1, e._2, 0, e._3, Some(e._4))))
      .sortBy(e => (EventPipelines.tsMicros(e.ts), e.side, e.id))
    val cuts = Seq(0, 97, 500, 501, 1700, tagged.length / 2,
      tagged.length * 9 / 10, tagged.length).distinct.sorted
    val mem = MemoryStream[EventPipelines.AsofUnion]
    val q = EventPipelines.streamAsofTagged(mem.toDS())
      .writeStream.format("memory").queryName("saj")
      .outputMode("append").start()
    try {
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { mem.addData(tagged.slice(a, b).toSeq: _*)
          q.processAllAvailable() }
      }
    } finally q.stop()
    val got = s.table("saj").collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(5)) -1.0 else r.getDouble(5))).toSet
    val want = graft.operators.AsofJoin.asof(
        leftRows.toSeq.toDF("key", "ts", "left_id", "v").drop("v"),
        rightRows.toSeq.toDF("key", "ts", "right_id", "right_value"),
        Seq("key"), "ts", "ts", Seq("right_id", "right_value"), "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    val extra = got -- want; val missing = want -- got
    assert(got.nonEmpty && got == want,
      s"extra=${extra.take(5)} missing=${missing.take(5)} " +
        s"sizes got=${got.size} want=${want.size}")
  }

  test("streamAsofJoin: two-stream union, tolerance gate, null timestamps") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val lMem = MemoryStream[EventPipelines.AsofLeftEvent]
    val rMem = MemoryStream[EventPipelines.AsofRightEvent]
    val lRows = Seq(
      EventPipelines.AsofLeftEvent(1L, ts("2026-01-01 10:00:00"), 100L),
      EventPipelines.AsofLeftEvent(1L, ts("2026-01-01 12:00:00"), 101L),
      EventPipelines.AsofLeftEvent(1L, null, 102L), // null leftTs: unmatched
      EventPipelines.AsofLeftEvent(2L, ts("2026-01-01 09:00:00"), 103L))
    val rRows = Seq(
      EventPipelines.AsofRightEvent(1L, ts("2026-01-01 10:00:00"), 7L, 1.5),
      EventPipelines.AsofRightEvent(1L, ts("2026-01-01 10:00:00"), 9L, 2.5),
      EventPipelines.AsofRightEvent(1L, null, 99L, 9.9), // dropped
      EventPipelines.AsofRightEvent(2L, ts("2026-01-01 08:00:00"), 8L, 3.5))
    lMem.addData(lRows: _*); rMem.addData(rRows: _*)
    val q = EventPipelines
      .streamAsofJoin(lMem.toDS(), rMem.toDS(),
        toleranceMs = Some(3600_000L))
      .writeStream.format("memory").queryName("saj2")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = s.table("saj2").collect().map(r => r.getLong(1) ->
      (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // 100: inclusive boundary + max-id tie -> right 9; 101: outside
    // the 1 h tolerance -> null; 102: null leftTs -> null (never the
    // null-ts right row); 103: within tolerance -> right 8
    assert(got == Map(100L -> 9L, 101L -> -1L, 102L -> -1L, 103L -> 8L))
  }

  test("streamAsofTagged: a matched right's NULL payload stays null (never 0.0)") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[EventPipelines.AsofUnion]
    mem.addData(
      EventPipelines.AsofUnion(1L, ts("2026-01-01 10:00:00"), 0, 7L, None),
      EventPipelines.AsofUnion(1L, ts("2026-01-01 11:00:00"), 1, 100L, None))
    val q = EventPipelines.streamAsofTagged(mem.toDS())
      .writeStream.format("memory").queryName("sanull")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val r = s.table("sanull").collect().head
    assert(r.getLong(3) == 7L, "the null-valued right IS the match")
    assert(r.isNullAt(5), "its payload must surface as null, not 0.0")
  }

  test("streamAsofTagged eviction: state drops past the horizon, fresh rights rebuild it") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    def right(ts: Timestamp, id: Long, v: Double) =
      EventPipelines.AsofUnion(1L, ts, 0, id, Some(v))
    def left(ts: Timestamp, id: Long) =
      EventPipelines.AsofUnion(1L, ts, 1, id, None)
    val mem = MemoryStream[EventPipelines.AsofUnion]
    val q = EventPipelines.streamAsofTagged(mem.toDS(),
        watermark = "1 hour", evictAfterMs = Some(24L * 3600 * 1000))
      .writeStream.format("memory").queryName("saev")
      .outputMode("append").start()
    try {
      // batch 1: a right then a matching left — pre-horizon the
      // eviction arm behaves exactly like the unevicted one
      mem.addData(right(ts("2026-01-01 10:00:00"), 7L, 1.5),
        left(ts("2026-01-01 11:00:00"), 100L))
      q.processAllAvailable()
      // batch 2+3: sentinel key pushes the event-time watermark
      // 30 days past the right row — its struct must evict
      mem.addData(EventPipelines.AsofUnion(99L,
        ts("2026-02-01 00:00:00"), 0, 900L, Some(0.0)))
      q.processAllAvailable()
      mem.addData(EventPipelines.AsofUnion(99L,
        ts("2026-02-01 02:00:00"), 0, 901L, Some(0.0)))
      q.processAllAvailable()
      // batch 4: a left on the evicted key matches NOTHING (an
      // unevicted operator would match right 7); a fresh right
      // then rebuilds the state for the next left
      mem.addData(left(ts("2026-02-01 03:00:00"), 101L))
      q.processAllAvailable()
      mem.addData(right(ts("2026-02-01 04:00:00"), 8L, 2.5),
        left(ts("2026-02-01 05:00:00"), 102L))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("saev").where(col("key") === 1L)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(100L -> 7L, 101L -> -1L, 102L -> 8L))
  }

  test("streamAsofTagged eviction: a stale key touched below the watermark cannot kill the query") {
    // the review-caught crash: key 1's horizon passes (other keys
    // advance the watermark) and THEN a null-ts row for key 1
    // arrives — seenMs doesn't advance, and an unclamped
    // setTimeoutTimestamp(seenMs + evict) sits below the watermark,
    // which Spark rejects with an exception that terminates the
    // whole query; the clamp re-arms at watermark+1 instead
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[EventPipelines.AsofUnion]
    val q = EventPipelines.streamAsofTagged(mem.toDS(),
        watermark = "1 hour", evictAfterMs = Some(24L * 3600 * 1000))
      .writeStream.format("memory").queryName("saevclamp")
      .outputMode("append").start()
    try {
      mem.addData(EventPipelines.AsofUnion(1L,
        ts("2026-01-01 10:00:00"), 0, 7L, Some(1.0)))
      q.processAllAvailable()
      // watermark jumps 30 days on a different key; key 1's timeout
      // (Jan 2) is now far below it — but key 1 had no data this
      // trigger, so its timeout just fires and evicts cleanly
      mem.addData(EventPipelines.AsofUnion(99L,
        ts("2026-02-01 00:00:00"), 0, 900L, Some(0.0)))
      q.processAllAvailable()
      // key 1 gets a RIGHT row (rebuilds state, seenMs = its ts,
      // still ~30 days below the watermark) and a null-ts left in
      // one batch: state.update + setTimeoutTimestamp run with a
      // stale seenMs — the unclamped form throws here
      mem.addData(
        EventPipelines.AsofUnion(1L, ts("2026-01-03 10:00:00"), 0, 8L,
          Some(2.0)),
        EventPipelines.AsofUnion(1L, null, 1, 100L, None))
      q.processAllAvailable()
      mem.addData(EventPipelines.AsofUnion(99L,
        ts("2026-02-01 02:00:00"), 0, 901L, Some(0.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(q.exception.isEmpty,
      s"query must survive the stale-timeout clamp: ${q.exception}")
    val got = s.table("saevclamp").where(col("key") === 1L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 100L &&
      got.head.isNullAt(3), "the null-ts left emits unmatched")
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
