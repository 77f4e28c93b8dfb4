package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing

class BucketingSpec extends GraftSuite {
  import spark.implicits._

  private def dropTables(names: String*): Unit =
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("co-located join of same-bucketed tables runs without a shuffle") {
    dropTables("bs_facts", "bs_dim")
    val facts = spark.range(0, 2000).select(
      (col("id") % 100).as("k"), (col("id") * 3).as("qty"))
    val dim = spark.range(0, 100).select(
      col("id").as("k"), concat(lit("name_"), col("id")).as("nm"))
    Bucketing.writeBucketed(facts, "bs_facts", Seq("k"), buckets = 8,
      sortCols = Seq("k"))
    Bucketing.writeBucketed(dim, "bs_dim", Seq("k"), buckets = 8,
      sortCols = Seq("k"))

    // force the join strategy that would otherwise shuffle both sides
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "bs_facts", "bs_dim",
        Seq("k"))
      val rows = joined.count()
      assert(rows == 2000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join plan still shuffles:\n$plan")

      // the same join WITHOUT bucketing does shuffle — the assertion
      // above is meaningful, not vacuous
      val unbucketed = facts.join(dim, Seq("k"))
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"))

      // results identical to the plain join
      val a = joined.select("k", "qty", "nm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val b = unbucketed.select("k", "qty", "nm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      dropTables("bs_facts", "bs_dim")
    }
  }

  test("store maintenance: appends stay exchange-free, compaction bounds fragments") {
    import graft.operators.Dedup
    dropTables("bs_sigstore", "bs_sigstore__compacting")
    val numHashes = 32
    val bands = 8
    val docs = graft.io.Tables(spark, sfDir).documents
    def sigsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(d, col("doc_id"), col("text"),
        n = 3, numHashes = numHashes)
    def idxOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.bandIndex(sigsOf(d), numHashes, bands)
    val slice = pmod(xxhash64(col("doc_id")), lit(10))
    // day 0 store + three daily appends + a day-4 increment batch
    Bucketing.writeBucketed(idxOf(docs.where(slice < 6)), "bs_sigstore",
      Seq("band", "bk"), buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      (6 to 8).foreach { day =>
        val compacted = Bucketing.appendAndMaintain(
          idxOf(docs.where(slice === day)), "bs_sigstore",
          Seq("band", "bk"), buckets = 8, maxFragments = 16)
        assert(!compacted, "compaction must not trip under the bound")
      }
      // bucket-aligned appends: exactly one new file per bucket per day
      val fpb = Bucketing.filesPerBucket(spark, "bs_sigstore")
      assert(fpb.nonEmpty && fpb.values.max == 4,
        s"expected 4 fragments/bucket after day0 + 3 appends, got $fpb")
      val storeRows = spark.table("bs_sigstore").count()
      // the appended store == a fresh index of the same corpus
      val freshIdx = idxOf(docs.where(slice < 9))
      assert(storeRows == freshIdx.count())

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val newSigs = sigsOf(docs.where(slice === 9))
      def inc(refIdx: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalLshPairsFromIndex(newSigs, refIdx,
          numHashes, bands, threshold = 0.5)
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val fromStore = inc(spark.table("bs_sigstore"))
      val fromFresh = inc(freshIdx)
      val got = pairs(fromStore)
      assert(got.nonEmpty && got == pairs(fromFresh),
        "day-N appended store diverges from a fresh full index")
      assert(exchanges(fromStore) < exchanges(fromFresh),
        s"appended store still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromFresh)}")

      // over the bound → rewrite to one file per bucket, content intact
      assert(Bucketing.compactIfFragmented(spark, "bs_sigstore",
        Seq("band", "bk"), buckets = 8, maxFragments = 2))
      val fpbAfter = Bucketing.filesPerBucket(spark, "bs_sigstore")
      assert(fpbAfter.values.max == 1, s"compaction left fragments: $fpbAfter")
      assert(spark.table("bs_sigstore").count() == storeRows)
      val fromCompacted = inc(spark.table("bs_sigstore"))
      assert(pairs(fromCompacted) == got)
      assert(exchanges(fromCompacted) < exchanges(fromFresh))
      // idempotent below the bound
      assert(!Bucketing.compactIfFragmented(spark, "bs_sigstore",
        Seq("band", "bk"), buckets = 8, maxFragments = 2))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropTables("bs_sigstore", "bs_sigstore__compacting")
    }
  }

  test("winnowing fingerprint store: bucketed by fp, the increment joins with fewer exchanges") {
    import graft.operators.Dedup
    dropTables("bs_winnowstore")
    val docs = graft.io.Tables(spark, sfDir).documents
    val ref = docs.where(col("doc_id") % 3 === 0)
    val batch = docs.where(col("doc_id") % 3 =!= 0)
    def fpsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.winnowFingerprints(d, col("doc_id"), col("text"), k = 5, w = 4)
        .select(col("id"), col("fp")).distinct()
    Bucketing.writeBucketed(fpsOf(ref), "bs_winnowstore", Seq("fp"),
      buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def inc(refFps: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalWinnowPairs(batch, col("doc_id"), col("text"),
          refFps, k = 5, w = 4, maxFpDf = Some(64))
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val fromStore = inc(spark.table("bs_winnowstore"))
      val fromFresh = inc(fpsOf(ref))
      val got = pairs(fromStore)
      assert(got.nonEmpty && got == pairs(fromFresh),
        "bucketed fp store diverges from a fresh fingerprint frame")
      assert(exchanges(fromStore) < exchanges(fromFresh),
        s"bucketed store still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromFresh)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropTables("bs_winnowstore")
    }
  }

  test("shingle index store: bucketed by shingle, the containment/jaccard increments join with fewer exchanges") {
    import graft.operators.Dedup
    dropTables("bs_shstore")
    val docs = graft.io.Tables(spark, sfDir).documents
    val ref = docs.where(col("doc_id") % 3 === 0)
    val batch = docs.where(col("doc_id") % 3 =!= 0)
    def idxOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.shingleIndex(d, col("doc_id"), col("text"), n = 3)
    Bucketing.writeBucketed(idxOf(ref), "bs_shstore", Seq("shingle"),
      buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def inc(refIdx: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalContainmentPairsFromIndex(batch, refIdx,
          col("doc_id"), col("text"), n = 3, threshold = 0.4,
          maxShingleDf = Some(64))
      def outOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(_.toSeq).toSet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val fromStore = inc(spark.table("bs_shstore"))
      val fromFresh = inc(idxOf(ref))
      val got = outOf(fromStore)
      assert(got.nonEmpty && got == outOf(fromFresh),
        "bucketed shingle store diverges from a fresh index")
      assert(exchanges(fromStore) < exchanges(fromFresh),
        s"bucketed store still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromFresh)}")
      // the jaccard increment reads the same store the same way
      val jStore = Dedup.incrementalJaccardPairsFromIndex(batch,
        spark.table("bs_shstore"), col("doc_id"), col("text"), n = 3,
        threshold = 0.5, maxShingleDf = Some(64))
      val jFresh = Dedup.incrementalJaccardPairs(batch, ref,
        col("doc_id"), col("text"), n = 3, threshold = 0.5,
        maxShingleDf = Some(64))
      assert(outOf(jStore) == outOf(jFresh))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropTables("bs_shstore")
    }
  }

  test("gram-count store: bucketed by h, the incremental span detector joins with fewer exchanges") {
    import graft.operators.Dedup
    dropTables("bs_gramstore")
    val docs = graft.io.Tables(spark, sfDir).documents
    val ref = docs.where(col("doc_id") % 3 === 0)
    val batch = docs.where(col("doc_id") % 3 =!= 0)
    def countsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.gramCounts(d, col("doc_id"), col("text"), minRun = 10)
    // buckets == the suite's shuffle parallelism: the store's scan
    // partitioning then slots straight into the count-union join
    // (a mismatched bucket count would re-shuffle one side and the
    // layout would buy nothing here — unlike the index stores, the
    // fresh path's own aggregate already leaves h-partitioned data)
    Bucketing.writeBucketed(countsOf(ref), "bs_gramstore", Seq("h"),
      buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def inc(refCounts: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalRepeatedSpans(batch, refCounts,
          col("doc_id"), col("text"), minRun = 10)
      def outOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(_.toSeq).toSet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val fromStore = inc(spark.table("bs_gramstore"))
      val fromFresh = inc(countsOf(ref))
      val got = outOf(fromStore)
      assert(got.nonEmpty && got == outOf(fromFresh),
        "bucketed gram store diverges from fresh counts")
      assert(exchanges(fromStore) < exchanges(fromFresh),
        s"bucketed store still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromFresh)}")
      // maintenance is additive: store + batch counts re-aggregate to
      // the post-ingest store (counts SUM under appends)
      val merged = spark.table("bs_gramstore")
        .unionByName(countsOf(batch))
        .groupBy("h").agg(sum(col("c")).as("c"))
      val rebuilt = countsOf(docs)
      assert(outOf(merged) == outOf(rebuilt),
        "additive maintenance diverges from a rebuild")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropTables("bs_gramstore")
    }
  }

  test("CDC chunk store: bucketed by ctext, the incremental anti-join reads it without a store-side exchange") {
    import graft.operators.Dedup
    dropTables("bs_cdcstore")
    val docs = graft.io.Tables(spark, sfDir).documents
    val ref = docs.where(col("doc_id") % 3 === 0)
    val batch = docs.where(col("doc_id") % 3 =!= 0)
    def chunksOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.cdcChunks(d, col("doc_id"), col("text"), k = 3, divisor = 16)
        .where(col("eligible")).select("ctext").distinct()
    Bucketing.writeBucketed(chunksOf(ref), "bs_cdcstore", Seq("ctext"),
      buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def inc(refChunks: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalCdcDedup(batch, col("doc_id"), col("text"),
          refChunks, k = 3, divisor = 16)
      def outOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(_.toSeq).toSet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val fromStore = inc(spark.table("bs_cdcstore"))
      val fromFresh = inc(chunksOf(ref))
      val got = outOf(fromStore)
      assert(got.nonEmpty && got == outOf(fromFresh),
        "bucketed chunk store diverges from a fresh chunk frame")
      assert(exchanges(fromStore) < exchanges(fromFresh),
        s"bucketed store still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromFresh)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropTables("bs_cdcstore")
    }
  }

  test("aggregation on the bucket key skips the exchange") {
    dropTables("bs_agg")
    val facts = spark.range(0, 2000).select(
      (col("id") % 50).as("k"), col("id").as("v"))
    Bucketing.writeBucketed(facts, "bs_agg", Seq("k"), buckets = 4)
    try {
      val agg = spark.table("bs_agg").groupBy("k")
        .agg(sum(col("v")).as("s"))
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 50 && got(0L) == (0L until 2000L by 50L).sum)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally dropTables("bs_agg")
  }
}
