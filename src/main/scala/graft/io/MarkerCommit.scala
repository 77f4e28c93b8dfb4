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

  /** A prior crash can leave `dir + ".old"` holding the ONLY
    * committed artifact (predecessor renamed aside, successor's
    * marker never landed). Restore it so every caller — reader or
    * writer — sees the committed chain; called at the top of every
    * store entry point, because a recovery that only runs inside
    * write() is unreachable from a maintenance path that READS
    * first (the appendMerged lesson). */
  def recover(dir: String, marker: String): Unit = {
    val old = dir + ".old"
    if (Files.exists(Paths.get(old, marker)) &&
        !Files.exists(Paths.get(dir, marker))) {
      deleteRecursively(dir) // marker-less half-write, if any
      Files.move(Paths.get(old), Paths.get(dir))
    }
  }

  /** Swap the fully-written `tmp` into `dir` under the marker-last
    * discipline. `tmp` must hold the complete successor artifact
    * (minus the marker, which THIS call writes). */
  def commitSwap(dir: String, tmp: String, marker: String): Unit = {
    val old = dir + ".old"
    recover(dir, marker)
    deleteRecursively(old) // stale leftover from a prior crash
    if (Files.exists(Paths.get(dir)))
      Files.move(Paths.get(dir), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(dir))
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
