package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Merge, Scd, VersionStore}
import graft.io.PartitionedStore

class MergeSpec extends GraftSuite {
  import spark.implicits._

  // (key, value, ts, tie, delete)
  private def changesDf(rows: (Int, String, Int, Int, Boolean)*): DataFrame =
    rows.toSeq.toDF("k", "v", "ts", "tie", "is_delete")

  private def targetDf(rows: (Int, String)*): DataFrame =
    rows.toSeq.toDF("k", "v")

  private def asSet(df: DataFrame): Set[(Int, String)] =
    df.select("k", "v").as[(Int, String)].collect().toSet

  test("merge semantics: update / insert / delete / in-batch supersession") {
    val target = targetDf(1 -> "a", 2 -> "b", 3 -> "c")
    val changes = changesDf(
      (1, "a2", 10, 1, false),  // update
      (4, "d", 10, 1, false),   // insert
      (2, "ignored", 10, 1, true),   // delete an existing key
      (5, "ghost", 10, 1, true),     // delete an ABSENT key: no-op, no insert
      (3, "mid", 10, 1, false),      // superseded within the batch...
      (3, "late", 11, 1, false),     // ...by a later ts
      (4, "d-tie", 10, 0, false))    // loses the tie to (10, 1)
    val got = asSet(Merge.merge(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete")))
    assert(got == Set(1 -> "a2", 3 -> "late", 4 -> "d"))
  }

  test("delete superseded by a later upsert keeps the key") {
    val target = targetDf(1 -> "a")
    val changes = changesDf(
      (1, "x", 10, 1, true),
      (1, "resurrected", 11, 1, false))
    val got = asSet(Merge.merge(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete")))
    assert(got == Set(1 -> "resurrected"))
  }

  test("upsert superseded by a later delete drops the key") {
    val target = targetDf(1 -> "a")
    val changes = changesDf(
      (1, "x", 10, 1, false),
      (1, "y", 11, 1, true))
    val got = asSet(Merge.merge(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete")))
    assert(got.isEmpty)
  }

  test("idempotent re-delivery: merge(merge(t,c),c) == merge(t,c)") {
    val target = targetDf(1 -> "a", 2 -> "b", 6 -> "f")
    val changes = changesDf(
      (1, "a2", 10, 1, false), (2, "x", 10, 1, true),
      (3, "c", 10, 1, false), (3, "c2", 12, 1, false),
      (9, "gone", 10, 1, true))
    def m(t: DataFrame) = Merge.merge(t, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete"))
    val once = m(target)
    assert(asSet(m(once)) == asSet(once))
    assert(asSet(once) == Set(1 -> "a2", 3 -> "c2", 6 -> "f"))
  }

  test("SCD2 composition: folding batches == buildType2's current rows") {
    // a deterministic change stream over 20 keys, 3 batches
    val all = (0 until 120).map { i =>
      val k = i % 20
      (k, s"v${(i * 7) % 5}_$k", i / 40 * 100 + i, i)
    } // (k, v, ts, tie) — ts strictly increasing within and across batches
    val batches = all.grouped(40).map(b =>
      b.toDF("k", "v", "ts", "tie")).toSeq
    val empty = targetDf()
    val merged = batches.foldLeft(empty: DataFrame)((t, c) =>
      // materialize each day's table as a real store would — also
      // keeps the fold's lineage from nesting 3 window plans deep
      m2(Merge.merge(t, c, Seq("k"), col("ts"), col("tie"))))
    val type2Current = Scd.buildType2(
        all.toDF("k", "v", "ts", "tie"), Seq("k"), col("ts"), col("tie"),
        Seq("v"))
      .where(col("is_current") === 1).select("k", "v")
    assert(asSet(merged) == type2Current.as[(Int, String)].collect().toSet)
  }

  private def m2(df: DataFrame): DataFrame = {
    val p = Files.createTempDirectory("merge_fold").toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("mergeVersioned commits through the store; history keeps both states") {
    val root = Files.createTempDirectory("mvs").toString
    VersionStore.write(targetDf(1 -> "a", 2 -> "b"), root)
    val v = Merge.mergeVersioned(spark, root,
      changesDf((1, "a2", 10, 1, false), (2, "x", 10, 1, true),
        (3, "c", 10, 1, false)),
      Seq("k"), col("ts"), col("tie"), deleteFlag = Some("is_delete"))
    assert(v == 1L)
    assert(asSet(VersionStore.latest(spark, root)) ==
      Set(1 -> "a2", 3 -> "c"))
    // time travel still shows the pre-merge table
    assert(asSet(VersionStore.asOf(spark, root, 0)) ==
      Set(1 -> "a", 2 -> "b"))
  }

  test("versioned crash windows ride the shared MarkerCommit discipline") {
    val root = Files.createTempDirectory("mvc").toString
    VersionStore.write(targetDf(1 -> "a"), root)

    // marker-less v=1 + claim (crash between move-in and marker):
    // invisible to readers, does not block the next write
    val v1 = java.nio.file.Paths.get(root, "v=1")
    Files.createDirectories(v1)
    Files.writeString(v1.resolve("part-0.parquet"), "half-written")
    Files.writeString(java.nio.file.Paths.get(root, "_claim_v=1"), "")
    assert(VersionStore.versions(spark, root) == Seq(0L))
    assert(VersionStore.write(targetDf(2 -> "b"), root) == 2L)

    // stranded `.building` temp (crash mid-parquet-write): also
    // invisible, swept by vacuum once past the claim TTL (and NOT
    // before — a live writer's temp must survive)
    val tmp = java.nio.file.Paths.get(root, "v=9.building")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("part-0.parquet"), "half")
    assert(VersionStore.versions(spark, root) == Seq(0L, 2L))
    VersionStore.vacuum(spark, root, keepLast = 5,
      claimTtlMs = 24L * 3600 * 1000)
    assert(Files.exists(tmp)) // too young: kept
    VersionStore.vacuum(spark, root, keepLast = 5, claimTtlMs = -1000)
    assert(!Files.exists(tmp) && !Files.exists(v1))
    assert(VersionStore.versions(spark, root) == Seq(0L, 2L))

    // stranded `.old` predecessor (the rename-aside crash window of
    // the shared swap): the ONLY committed copy lives at v=N.old —
    // MarkerCommit.recover restores it and the version reappears
    val v0 = java.nio.file.Paths.get(root, "v=0")
    Files.move(v0, java.nio.file.Paths.get(root, "v=0.old"))
    assert(VersionStore.versions(spark, root) == Seq(2L))
    graft.io.MarkerCommit.recover(v0.toString, "_SUCCESS")
    assert(VersionStore.versions(spark, root) == Seq(0L, 2L))
    assert(asSet(VersionStore.asOf(spark, root, 0)) == Set(1 -> "a"))
  }

  test("mergePartitioned rewrites only touched partitions; deletes can empty one") {
    val path = Files.createTempDirectory("mp").toString
    // partition = key-stable hash bucket (the canonical choice)
    def withPart(df: DataFrame): DataFrame =
      df.withColumn("p", pmod(col("k").cast("long"), lit(4L)))
    PartitionedStore.write(
      withPart(targetDf((0 until 32).map(i => i -> s"v$i"): _*)),
      path, "p")
    val before = PartitionedStore.filesPerPartition(spark, path, "p")
    assert(before.keySet == Set("0", "1", "2", "3"))
    val untouchedFiles = Files.list(
        java.nio.file.Paths.get(path, "p=2")).toArray.toSeq
    // changes touch p=1 (update k=1, insert k=33) and p=3 (delete
    // EVERY k ≡ 3 mod 4 — empties the partition)
    val deletes = (0 until 32).filter(_ % 4 == 3)
      .map(k => (k, "x", 10, 1, true))
    val changes = withPart(changesDf(
      Seq((1, "one", 10, 1, false), (33, "new", 10, 1, false)) ++
        deletes: _*))
    val touched = Merge.mergePartitioned(spark, path, changes, Seq("k"),
      col("ts"), col("tie"), partCol = "p",
      deleteFlag = Some("is_delete"))
    assert(touched == Seq("1", "3"))
    // semantics == the frame-level merge over the full table
    val got = spark.read.parquet(path).select("k", "v")
      .as[(Int, String)].collect().toSet
    val want = asSet(Merge.merge(
      withPart(targetDf((0 until 32).map(i => i -> s"v$i"): _*)),
      changes, Seq("k"), col("ts"), col("tie"), Some("is_delete")))
    assert(got == want)
    assert(got.contains(33 -> "new") && got.contains(1 -> "one"))
    assert(!got.exists(_._1 % 4 == 3))
    // untouched partition: same physical files, byte for byte
    assert(Files.list(java.nio.file.Paths.get(path, "p=2"))
      .toArray.toSeq == untouchedFiles)
    // emptied partition directory is gone (dynamic overwrite alone
    // would have left its stale files standing)
    assert(!Files.exists(java.nio.file.Paths.get(path, "p=3")))
  }

  test("mergePartitioned rejects a non-key-stable partition column") {
    val path = Files.createTempDirectory("mpbad").toString
    PartitionedStore.write(
      targetDf(1 -> "a", 2 -> "b").withColumn("p", col("k") % 2),
      path, "p")
    // the change row for k=1 claims partition 0 — its stored row
    // lives in p=1, which this batch ALSO touches (k=3's insert), so
    // the slice contains the mismatch: the guard must fail before
    // anything is written. (A stale row in an UNTOUCHED partition is
    // the documented undetectable case — the guard's contract is to
    // catch an unstable partCol on the first batch that exhibits it
    // within the read slice.)
    val bad = changesDf((1, "moved", 10, 1, false))
      .withColumn("p", lit(0))
      .unionByName(changesDf((3, "ok", 10, 1, false))
        .withColumn("p", lit(1)))
    val e = intercept[IllegalArgumentException] {
      Merge.mergePartitioned(spark, path, bad, Seq("k"),
        col("ts"), col("tie"), partCol = "p")
    }
    assert(e.getMessage.contains("key-stable"))
    // nothing changed
    assert(spark.read.parquet(path).select("k", "v")
      .as[(Int, String)].collect().toSet == Set(1 -> "a", 2 -> "b"))
  }

  test("changes missing a target column are rejected") {
    val e = intercept[IllegalArgumentException] {
      Merge.merge(targetDf(1 -> "a"),
        Seq((1, 10, 1)).toDF("k", "ts", "tie"), Seq("k"),
        col("ts"), col("tie"))
    }
    assert(e.getMessage.contains("missing"))
  }

  private def feedSet(df: DataFrame): Set[(Int, String, String)] =
    df.select("k", "v", "action").as[(Int, String, String)]
      .collect().toSet

  test("changeFeed labels insert/update/delete; absent-key delete emits nothing") {
    val target = targetDf(1 -> "a", 2 -> "b", 3 -> "c")
    val changes = changesDf(
      (1, "a2", 10, 1, false),     // update
      (4, "d", 10, 1, false),      // insert
      (2, "ignored", 10, 1, true), // delete: pre-image rides the feed
      (5, "ghost", 10, 1, true),   // delete of an absent key: NOTHING
      (3, "mid", 10, 1, false),
      (3, "late", 11, 1, false))   // in-batch supersession resolves first
    val feed = Merge.changeFeed(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete"))
    assert(feedSet(feed) == Set(
      (1, "a2", "update"), (4, "d", "insert"),
      (2, "b", "delete"),  // the TARGET's row, not the change's
      (3, "late", "update")))
  }

  test("applyFeed(target, changeFeed) == merge(target, changes)") {
    val target = targetDf(1 -> "a", 2 -> "b", 3 -> "c", 6 -> "f")
    val changes = changesDf(
      (1, "a2", 10, 1, false), (2, "x", 10, 1, true),
      (4, "d", 10, 1, false), (9, "ghost", 10, 1, true),
      (3, "mid", 10, 1, false), (3, "late", 11, 1, true))
    val feed = Merge.changeFeed(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete"))
    val viaFeed = asSet(Merge.applyFeed(target, feed, Seq("k")))
    val direct = asSet(Merge.merge(target, changes, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete")))
    assert(viaFeed == direct)
    assert(direct == Set(1 -> "a2", 4 -> "d", 6 -> "f"))
  }

  test("changeFeed reserves the action column") {
    val e = intercept[IllegalArgumentException] {
      Merge.changeFeed(
        targetDf(1 -> "a").withColumn("action", lit("x")),
        changesDf((1, "b", 10, 1, false)).withColumn("action", lit("y")),
        Seq("k"), col("ts"), col("tie"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("streamVersioned: ordered batches fold to the log merge; replay is idempotent") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("msv").toString
    VersionStore.write(targetDf(1 -> "a", 2 -> "b", 3 -> "c"), root)
    // a change log in event-time order, split at ARBITRARY points
    // (sizes 1/4/2/3) — the ordered-delivery contract is per key
    // across batches, which any time-ordered split satisfies
    val log = Seq(
      MergeChg(1, "a2", 10, 1, false), MergeChg(4, "d", 11, 1, false),
      MergeChg(2, "x", 12, 1, true), MergeChg(5, "ghost", 12, 2, true),
      MergeChg(4, "d2", 13, 1, false), MergeChg(6, "e", 14, 1, false),
      MergeChg(1, "a3", 15, 1, false), MergeChg(6, "gone", 16, 1, true),
      MergeChg(7, "g", 17, 1, false), MergeChg(3, "c2", 18, 1, false))
    val splits = Seq(log.slice(0, 1), log.slice(1, 5), log.slice(5, 7),
      log.slice(7, 10))
    val mem = MemoryStream[MergeChg]
    val q = Merge.streamVersioned(mem.toDF(), root, Seq("k"),
      col("ts"), col("tie"), deleteFlag = Some("is_delete")).start()
    try {
      splits.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val want = asSet(Merge.merge(targetDf(1 -> "a", 2 -> "b", 3 -> "c"),
        log.toDF(), Seq("k"), col("ts"), col("tie"),
        deleteFlag = Some("is_delete")))
      assert(asSet(VersionStore.latest(spark, root)
        .select("k", "v")) == want)
      assert(want == Set(1 -> "a3", 3 -> "c2", 4 -> "d2", 7 -> "g"))
      // at-least-once: re-delivering the last batch cannot diverge
      // the table (one redundant version, same rows)
      val vBefore = VersionStore.versions(spark, root).size
      mem.addData(splits.last: _*); q.processAllAvailable()
      assert(asSet(VersionStore.latest(spark, root)
        .select("k", "v")) == want)
      assert(VersionStore.versions(spark, root).size == vBefore + 1)
      // empty micro-batches commit nothing (no new version)
      q.processAllAvailable()
      assert(VersionStore.versions(spark, root).size == vBefore + 1)
    } finally q.stop()
  }
}

/** Change row for [[MergeSpec]]'s streaming arm (file-scope so the
  * product encoder derives cleanly). */
final case class MergeChg(k: Int, v: String, ts: Int, tie: Int,
                          is_delete: Boolean)
