package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

/** WHERE the atomicity of a [[VersionStore]] claim lives — the
  * pluggable seam for object stores. The whole OCC protocol
  * (claim-of-exactly-base+1, dense numbering, marker-last visibility,
  * rebase) reduces to ONE primitive: an exclusive create that two
  * concurrent writers can never both win. That primitive is
  * filesystem-dependent — atomic on HDFS and POSIX, advisory on
  * object stores whose create is check-then-put — so it is a trait,
  * not a hard-coded call: an S3 deployment plugs a conditional-put
  * (If-None-Match) or DynamoDB-lock implementation here and the rest
  * of the protocol is untouched (the Delta-on-S3 LogStore pattern;
  * everything EXCEPT the claim is already object-store safe).
  *
  * Contract: [[tryClaim]] returns true to EXACTLY ONE caller per
  * marker path, ever (until [[release]]); it must distinguish
  * "already taken" (false) from real I/O failure (throw) — swallowing
  * a permissions or connectivity error as "taken" turns a persistent
  * fault into an infinite claim-number climb in
  * [[VersionStore.write]]'s allocation loop, or a phantom OCC
  * conflict in [[VersionStore.tryCommit]]. */
trait ClaimStore extends Serializable {

  /** Atomically create the exclusive claim marker; true = this caller
    * owns the claim, false = some writer (possibly this one, earlier)
    * already holds it. Throws on any failure that is NOT an
    * already-exists race — the caller must see real faults. */
  def tryClaim(fs: FileSystem, marker: Path): Boolean

  /** Release a claim this caller owns — the cleanup path for a commit
    * that failed CLEANLY after claiming (schema rejection, failed
    * write job); never called for a claim that reached its commit. */
  def release(fs: FileSystem, marker: Path): Unit = {
    fs.delete(marker, false); ()
  }
}

object ClaimStore {

  /** The default exclusive create. `file://` paths go through NIO's
    * `Files.createFile` — the POSIX `O_CREAT|O_EXCL` open, atomic
    * even across PROCESSES (Hadoop's own LocalFileSystem `create` is
    * check-then-create: the barrier-aligned race in VersionStoreSpec
    * demonstrably double-claims through it, so it is NOT a valid
    * claim primitive). Every other scheme uses
    * `FileSystem.createNewFile`, which HDFS makes atomic; object
    * stores (S3A check-then-put) need a conditional-put or
    * lock-service [[ClaimStore]] instead — that hazard is the same
    * spec-pinned race.
    *
    * Exception discipline (r15 advice): only the documented
    * already-exists shapes read as "taken" — Hadoop's
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]], the NIO
    * equivalent, and an IOException whose message or cause says
    * "already exists" (several FileSystem impls wrap the race that
    * way instead of returning false). Every OTHER IOException
    * (permissions, connectivity, missing parent) rethrows. */
  object ExclusiveCreate extends ClaimStore {
    override def tryClaim(fs: FileSystem, marker: Path): Boolean =
      if ("file" == fs.getUri.getScheme) {
        val p = fs.makeQualified(marker).toUri.getPath
        try { java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p)); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // NoSuchFile, AccessDenied, ... rethrow: real faults
        }
      } else {
        try fs.createNewFile(marker)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException if isAlreadyExists(e) => false
        }
      }

    private def isAlreadyExists(e: Throwable): Boolean =
      e != null && (
        e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
        Option(e.getMessage).exists(
          _.toLowerCase.contains("already exist")) ||
        isAlreadyExists(e.getCause))
  }
}
