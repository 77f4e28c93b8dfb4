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
}
