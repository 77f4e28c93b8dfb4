package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.SketchStore
import graft.operators.{Bloom, Hdr, Hll, Sketch}

/** The sketch store contract: marker-gated commit (a reader never
  * sees a half-written frame), crash recovery through the `.old`
  * predecessor, and the headline identity — a frame APPENDED from
  * the store via the family's merge equals the one-shot frame over
  * the union, cell/register/bit/bucket-identical, for all four
  * sketch families. */
class SketchStoreSpec extends GraftSuite {

  private def docs = spark.read
    .parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  private def canon(df: DataFrame): Set[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf)).map(_.toSeq).toSet
  }

  private def fresh(name: String): String = {
    val d = s"/tmp/graft_sketch_store_spec/$name"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(del); p.delete()
    }
    del(new java.io.File(d)); del(new java.io.File(d + ".old"))
    del(new java.io.File(d + ".building"))
    d
  }

  test("write/read round-trip; readers gate on the marker alone") {
    val dir = fresh("rt")
    val frame = Sketch.countMinCells(docs, col("text"), 4, 512)
    SketchStore.write(dir, frame)
    assert(SketchStore.exists(dir))
    assert(canon(SketchStore.read(spark, dir)) == canon(frame))
    // single-file artifact: one parquet part
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.endsWith(".parquet")) == 1)
    // a marker-less directory is NOT readable — the commit is the
    // marker, not the directory's existence
    Files.delete(Paths.get(dir, "_SKETCH_READY"))
    intercept[IllegalArgumentException](SketchStore.read(spark, dir))
  }

  test("appendMerged == one-shot over the union, all four families") {
    val half = pmod(xxhash64(col("doc_id")), lit(2)) === 0
    val a = docs.where(half); val b = docs.where(!half)
    val cases: Seq[(String, DataFrame => DataFrame,
        (DataFrame, DataFrame) => DataFrame)] = Seq(
      ("cms", d => Sketch.countMinCells(d, col("text"), 4, 512),
        Sketch.cmsMerge),
      ("hll", d => Hll.tokenRegisters(d, col("text"), 256), Hll.hllMerge),
      ("bloom", d => Bloom.bloomBits(d, col("text"), 4096, 3),
        Bloom.bloomMerge),
      ("hdr", d => Hdr.tokenLengthFrame(d, col("text"), 3), Hdr.merge))
    cases.foreach { case (name, build, merge) =>
      val dir = fresh(name)
      SketchStore.write(dir, build(a))
      val appended = SketchStore
        .appendMerged(spark, dir, build(b), merge)
      assert(canon(appended) == canon(build(docs)),
        s"$name: appended-from-store != one-shot")
    }
  }

  test("crash windows: .old holding the only committed frame is restored") {
    val dir = fresh("crash")
    val v1 = Sketch.countMinCells(docs.limit(50), col("text"), 2, 64)
    SketchStore.write(dir, v1)
    // simulate the crash: predecessor renamed aside, successor never
    // committed — dir is marker-less garbage, .old holds the artifact
    Files.move(Paths.get(dir), Paths.get(dir + ".old"))
    Files.createDirectories(Paths.get(dir))
    assert(!SketchStore.exists(dir))
    val v2 = Sketch.countMinCells(docs.limit(80), col("text"), 2, 64)
    SketchStore.write(dir, v2) // must not lose the committed chain
    assert(SketchStore.exists(dir))
    assert(canon(SketchStore.read(spark, dir)) == canon(v2))
    assert(!Files.exists(Paths.get(dir + ".old")),
      "stale predecessor must be swept after commit")
  }

  test("appendMerged recovers the crash-stranded predecessor before reading") {
    // the crash window again, but entered through the MAINTENANCE
    // path: day-N upkeep READS first, so recovery must run on the
    // read path, not only inside write() (the review-caught gap —
    // an unrecovered appendMerged would abort, or worse, a
    // getOrBuild fallback would pay the full rebuild the store
    // exists to avoid)
    val dir = fresh("crashappend")
    val half = pmod(xxhash64(col("doc_id")), lit(2)) === 0
    SketchStore.write(dir, Sketch.countMinCells(docs.where(half),
      col("text"), 2, 64))
    Files.move(Paths.get(dir), Paths.get(dir + ".old"))
    Files.createDirectories(Paths.get(dir)) // marker-less garbage
    val appended = SketchStore.appendMerged(spark, dir,
      Sketch.countMinCells(docs.where(!half), col("text"), 2, 64),
      Sketch.cmsMerge)
    assert(canon(appended) ==
      canon(Sketch.countMinCells(docs, col("text"), 2, 64)),
      "recovered predecessor + day batch must equal the one-shot")
    // and getOrBuild must not retrain over a recoverable predecessor
    val dir2 = fresh("crashgob")
    SketchStore.write(dir2, Sketch.countMinCells(docs.limit(40),
      col("text"), 2, 64))
    val committed = canon(SketchStore.read(spark, dir2))
    Files.move(Paths.get(dir2), Paths.get(dir2 + ".old"))
    var rebuilt = false
    val served = SketchStore.getOrBuild(spark, dir2) {
      rebuilt = true; Sketch.countMinCells(docs, col("text"), 2, 64) }
    assert(!rebuilt && canon(served) == committed,
      "getOrBuild must serve the recovered frame, not rebuild")
  }

  test("getOrBuild builds once, then serves the committed frame") {
    val dir = fresh("gob")
    var builds = 0
    def build: DataFrame = { builds += 1
      Hll.tokenRegisters(docs, col("text"), 128) }
    val first = SketchStore.getOrBuild(spark, dir)(build)
    val second = SketchStore.getOrBuild(spark, dir)(build)
    assert(builds == 1, "second call must serve from the store")
    assert(canon(first) == canon(second))
  }
}
