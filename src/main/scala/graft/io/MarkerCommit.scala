package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

import org.apache.spark.sql.SparkSession

/** The shared marker-last commit protocol behind [[PqIndexStore]],
  * [[SketchStore]] and [[graft.etl.VersionStore]] — ONE copy of the
  * crash-safety sequence, so a hardening fix reaches every
  * committed-artifact store at once (the stores previously carried it
  * verbatim-duplicated).
  *
  * Contract (stated once, here): the MARKER is the commit — readers
  * gate on it alone and never list a marker-less directory. A write
  * lands fully under a temp sibling, [[recover]] restores a
  * predecessor that a prior crash left as the only committed
  * artifact, the predecessor is renamed ASIDE (never
  * delete-then-move), the successor moves in, the marker lands, and
  * only then is the predecessor dropped — a crash at ANY step leaves
  * a complete committed artifact on disk. Directory rename is a
  * local-fs/HDFS optimization; on an object store the same discipline
  * holds via content-addressed successor paths + marker-last (see
  * the PqIndexStore scaladoc).
  *
  * Filesystem resolution follows the DATA path: every operation goes
  * through Hadoop [[FileContext]] under the active Spark session's
  * Hadoop configuration, so a schemeless path lands on the SAME
  * filesystem `spark.read.parquet`/`df.write.parquet` resolve it to.
  * (The previous java.nio implementation wrote markers on the
  * driver-LOCAL fs while the frames went through `fs.defaultFS` — a
  * divergence invisible on `local[*]`, where both are the local disk,
  * but real on a cluster whose default is HDFS/ABFS: the store would
  * commit data remotely and markers locally, and every other reader
  * host would see an uncommitted artifact forever.) FileContext's
  * `Rename.NONE` gives the fail-if-destination-exists rename the race
  * absorption below depends on — `FileSystem.rename` has posix-mv
  * move-INTO-directory semantics that would silently nest the
  * successor instead of failing. */
private[graft] object MarkerCommit {

  private def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def ctx(p: Path): FileContext =
    FileContext.getFileContext(p.toUri, conf)

  /** Marker-gated visibility check — the ONE reader gate. */
  def markerExists(dir: String, marker: String): Boolean =
    fileExists(new Path(dir, marker).toString)

  def fileExists(path: String): Boolean = {
    val p = new Path(path)
    ctx(p).util().exists(p)
  }

  /** Create/overwrite a small marker/flag file with `content`. */
  def touch(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = ctx(p).create(p,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fail-if-destination-exists move (file or directory). */
  private def move(src: String, dst: String): Unit =
    ctx(new Path(src)).rename(new Path(src), new Path(dst),
      Options.Rename.NONE)

  /** WRITER-path recovery: a prior crash can leave `dir + ".old"`
    * holding the ONLY committed artifact (predecessor renamed
    * aside, successor's marker never landed). Restore it, deleting
    * any marker-less half-write occupying `dir`. Destructive, so it
    * runs ONLY from writer entry points (write/getOrBuild/append
    * maintenance), which the stores' single-writer contract covers;
    * a READ racing a live writer must never delete the successor the
    * writer just moved in — readers use [[recoverForRead]]. */
  def recover(dir: String, marker: String): Unit = {
    val old = dir + ".old"
    if (markerExists(old, marker) && !markerExists(dir, marker)) {
      deleteRecursively(dir) // marker-less half-write, if any
      move(old, dir)
    }
  }

  /** READER-path recovery: restore the `.old` predecessor ONLY when
    * `dir` is entirely absent (the crash window between rename-aside
    * and successor-move-in), and never delete anything — a
    * marker-less `dir` might be a live writer mid-swap, and
    * destroying it from a read would lose the commit (review-caught
    * race). Races between concurrent readers (both attempting the
    * restore) are absorbed: the loser's move throws and the caller's
    * marker re-check decides. */
  def recoverForRead(dir: String, marker: String): Unit = {
    val old = dir + ".old"
    if (markerExists(old, marker) && !fileExists(dir)) {
      try move(old, dir)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Swap the fully-written `tmp` into `dir` under the marker-last
    * discipline. `tmp` must hold the complete successor artifact
    * (minus the marker, which THIS call writes). Single-writer by
    * contract; a reader's concurrent restore racing the successor
    * move is absorbed by a BOUNDED retry loop — each restore the
    * reader wins re-lands the committed predecessor in `dir`, which
    * the next attempt re-asides before moving the successor in. The
    * bound (8) covers any realistic reader herd; exhausting it fails
    * the WRITE loudly while the committed predecessor stays intact
    * (safety holds either way — the marker is the commit). */
  def commitSwap(dir: String, tmp: String, marker: String): Unit = {
    val old = dir + ".old"
    recover(dir, marker)
    var landed = false
    var attempts = 0
    while (!landed) {
      attempts += 1
      deleteRecursively(old) // stale leftover from a prior crash/retry
      if (fileExists(dir)) move(dir, old)
      try { move(tmp, dir); landed = true }
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          // a racing reader restored `.old` into `dir` between our
          // rename-aside and move-in; it is the committed predecessor
          // again — loop: re-aside it and land the successor
          if (attempts >= 8) throw new java.io.IOException(
            s"commitSwap: reader-restore race persisted after $attempts " +
              s"attempts on $dir (committed predecessor intact)", e)
      }
    }
    touch(new Path(dir, marker).toString, "ready\n")
    deleteRecursively(old)
  }

  def deleteRecursively(dir: String): Unit = {
    val p = new Path(dir)
    val c = ctx(p)
    if (c.util().exists(p)) c.delete(p, true)
  }
}
