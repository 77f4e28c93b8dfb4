package graft.io

import java.nio.file.{Files, Paths}

/** The shared marker-last commit protocol behind [[PqIndexStore]]
  * and [[SketchStore]] — ONE copy of the crash-safety sequence, so a
  * hardening fix reaches every committed-artifact store at once
  * (the two stores previously carried it verbatim-duplicated).
  *
  * Contract (stated once, here): the MARKER is the commit — readers
  * gate on it alone and never list a marker-less directory. A write
  * lands fully under a temp sibling, [[recover]] restores a
  * predecessor that a prior crash left as the only committed
  * artifact, the predecessor is renamed ASIDE (never
  * delete-then-move), the successor moves in, the marker lands, and
  * only then is the predecessor dropped — a crash at ANY step leaves
  * a complete committed artifact on disk. Directory rename is a
  * local-fs optimization; on an object store the same discipline
  * holds via content-addressed successor paths + marker-last (see
  * the PqIndexStore scaladoc). */
private[io] object MarkerCommit {

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
    if (Files.exists(Paths.get(old, marker)) &&
        !Files.exists(Paths.get(dir, marker))) {
      deleteRecursively(dir) // marker-less half-write, if any
      Files.move(Paths.get(old), Paths.get(dir))
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
    if (Files.exists(Paths.get(old, marker)) &&
        !Files.exists(Paths.get(dir))) {
      try Files.move(Paths.get(old), Paths.get(dir))
      catch { case _: java.nio.file.FileSystemException => () }
    }
  }

  /** Swap the fully-written `tmp` into `dir` under the marker-last
    * discipline. `tmp` must hold the complete successor artifact
    * (minus the marker, which THIS call writes). Single-writer by
    * contract; a reader's concurrent restore racing the successor
    * move is absorbed by one retry (the restored frame is committed,
    * so the retry treats it as the predecessor and swaps again). */
  def commitSwap(dir: String, tmp: String, marker: String): Unit = {
    val old = dir + ".old"
    recover(dir, marker)
    deleteRecursively(old) // stale leftover from a prior crash
    if (Files.exists(Paths.get(dir)))
      Files.move(Paths.get(dir), Paths.get(old))
    try Files.move(Paths.get(tmp), Paths.get(dir))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // a racing reader restored `.old` into `dir` between our
        // rename-aside and move-in; it is the committed predecessor
        // again — re-aside it and land the successor
        deleteRecursively(old)
        Files.move(Paths.get(dir), Paths.get(old))
        Files.move(Paths.get(tmp), Paths.get(dir))
    }
    Files.writeString(Paths.get(dir, marker), "ready\n")
    deleteRecursively(old)
  }

  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      try it.forEach(f => Files.delete(f))
      finally it.close()
    }
  }
}
