package graft.etl

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Physical versioned-table store over plain parquet — the concrete
  * analog of the reference's Delta operations: append-a-version
  * ("time travels over its data with a retention period of 30 days",
  * README; `DESCRIBE HISTORY` / `OPTIMIZE` / `VACUUM`,
  * code/ukg_tbl_optmztn.py:24-75). `Snapshot.asOf` covers the
  * *logical* run-id form; this covers the *physical* one: each write
  * lands under `root/v=N/`, reads pin a directory, history lists the
  * manifest, vacuum deletes expired versions, optimize rewrites the
  * latest into a compacted successor.
  *
  * Scale notes: version metadata is directory listings — O(versions +
  * files), dimension-sized, via the Hadoop FileSystem API (any
  * scheme: file://, hdfs://, abfss://...). Data moves only in
  * `write`/`optimize`, and those are ordinary distributed parquet
  * writes. Readers of version N are isolated from vacuum of other
  * versions (directory granularity — nothing rewrites in place except
  * `optimize`, which writes a NEW version).
  */
object VersionStore {

  private val VersionDir = "^v=(\\d+)$".r

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (empty for a fresh root). A
    * version counts only once its `_SUCCESS` marker exists — a
    * crashed or in-flight write's partial `v=N` directory is
    * invisible to readers. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case VersionDir(n)
              if f.exists(new Path(s.getPath, "_SUCCESS")) =>
            Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  private def dir(root: String, v: Long) = s"$root/v=$v"
  private def claim(root: String, v: Long) = new Path(root, s"_claim_v=$v")

  /** Whether version `v` holds any data file. An empty-DataFrame
    * append commits only `_SUCCESS` — no parquet footers — so schema
    * inference on that directory throws; schema-sensitive paths must
    * skip such versions. */
  private def hasData(f: org.apache.hadoop.fs.FileSystem, root: String,
                      v: Long): Boolean =
    f.listStatus(new Path(dir(root, v)))
      .exists(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        s.getLen > 0)

  /** Append `df` as the next version; returns its number.
    *
    * Schema enforcement (the contract Delta gives the reference's
    * typed DDLs — the ddl scripts pin schemas and every notebook `append`
    * relies on drifting frames being rejected): the new frame's
    * schema must match the latest committed version's — same column
    * set, same types (nullability and column order don't affect
    * parquet readability and are not enforced). `evolve = true`
    * permits adding or dropping columns (each version directory is
    * self-contained, so per-version reads stay exact and `history`
    * records the change); a TYPE change for an existing column is
    * rejected even under `evolve` — that's silent corruption for any
    * reader unioning versions, never a widening.
    *
    * Concurrency: the version number is claimed with an exclusive
    * create of a sibling `_claim_v=N` marker before the write, so two
    * concurrent writers get *different* numbers instead of silently
    * committing into the same directory (the naive list-then-write
    * allocation is a TOCTOU race — `errorifexists` checks at job
    * start, before either has created the directory). NOTE the
    * exclusive create is atomic on HDFS and POSIX filesystems but NOT
    * on object stores (S3A's create is check-then-put; Hadoop's
    * RawLocalFileSystem is also check-then-create, though single-JVM
    * racers there are threads and close the window in practice) — on
    * an object store, front this with a coordination service or
    * accept last-writer-wins on the claim. A writer that crashes
    * after claiming leaves an unused number; its partial directory
    * stays invisible (no `_SUCCESS`) and `vacuum` sweeps it. */
  def write(df: DataFrame, root: String, evolve: Boolean = false): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    val committed = versions(spark, root)
    // enforce against the newest version that actually has parquet
    // footers: an empty-DataFrame append writes only _SUCCESS, and
    // inferring schema on it would throw — permanently bricking every
    // subsequent write. (Check-before-claim caveat: validation runs
    // before the claim marker, so two concurrent writers — one with
    // evolve=true — can both pass and commit conflicting schemas;
    // same single-writer assumption as the claim note below.)
    committed.reverse.find(hasData(f, root, _)).foreach { last =>
      // schema read = parquet footers of one version, driver-side
      val cur = spark.read.parquet(dir(root, last)).schema
      val curT = cur.fields.map(fd => fd.name -> fd.dataType).toMap
      val newT = df.schema.fields.map(fd => fd.name -> fd.dataType).toMap
      val clash = curT.keySet.intersect(newT.keySet)
        .filter(k => curT(k) != newT(k))
      require(clash.isEmpty,
        s"VersionStore.write: column type change rejected (v$last -> new): " +
          clash.toSeq.sorted.map(k => s"$k: ${curT(k)} -> ${newT(k)}")
            .mkString(", "))
      if (!evolve) {
        val added = newT.keySet -- curT.keySet
        val dropped = curT.keySet -- newT.keySet
        require(added.isEmpty && dropped.isEmpty,
          s"VersionStore.write: schema drift vs v$last rejected " +
            s"(added=${added.toSeq.sorted.mkString("[", ",", "]")}, " +
            s"dropped=${dropped.toSeq.sorted.mkString("[", ",", "]")}); " +
            "pass evolve=true to change columns deliberately")
      }
    }
    var next = committed.lastOption.fold(0L)(_ + 1)
    while (!f.createNewFile(claim(root, next))) next += 1
    val vdir = dir(root, next)
    // commit through the ONE audited crash-window implementation
    // (io.MarkerCommit, shared with PqIndexStore/SketchStore): the
    // version lands fully under a temp sibling, its job-committer
    // _SUCCESS is stripped (it would ride the directory move and make
    // the version visible at move time instead of marker time), then
    // commitSwap moves the directory in and writes the visibility
    // marker LAST. A crash mid-write strands only `v=N.building`; a
    // crash between move and marker leaves a marker-less `v=N` —
    // both invisible to [[versions]] and swept by [[vacuum]].
    require(!f.exists(new Path(vdir)),
      s"VersionStore.write: claimed number $next already has a " +
        s"directory at $vdir — claim protocol violated")
    val tmp = vdir + ".building"
    graft.io.MarkerCommit.deleteRecursively(tmp)
    df.write.mode("errorifexists").parquet(tmp)
    f.delete(new Path(tmp, "_SUCCESS"), false)
    graft.io.MarkerCommit.commitSwap(vdir, tmp, "_SUCCESS")
    next
  }

  /** Read one committed version. A FOOTERLESS version (only _SUCCESS —
    * an external writer's empty commit; Spark's own empty writes keep
    * a footer) has no inferable schema, so it reads as an EMPTY frame
    * borrowing the nearest preceding footered version's schema — the
    * version says "no data", and bricking every reader with an
    * AnalysisException would be strictly worse than the borrowed-
    * schema guess (which evolve-history makes visible). Throws only
    * when no version at or before `version` carries a footer. */
  private def readVersion(spark: SparkSession, root: String,
                          version: Long): DataFrame = {
    val f = fs(spark, root)
    if (hasData(f, root, version)) spark.read.parquet(dir(root, version))
    else {
      val donor = versions(spark, root).filter(_ <= version).reverse
        .find(hasData(f, root, _))
        .getOrElse(throw new IllegalStateException(
          s"version $version of $root has no parquet footers and no " +
            "earlier version does either — schema unknowable"))
      val schema = spark.read.parquet(dir(root, donor)).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    }
  }

  def asOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    require(versions(spark, root).contains(version),
      s"version $version not present under $root")
    readVersion(spark, root, version)
  }

  def latest(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versions under $root")
    readVersion(spark, root, vs.last)
  }

  /** DESCRIBE HISTORY analog: (version, n_files, bytes, modified,
    * schema_ddl) — the per-version schema makes an `evolve`d append
    * auditable (which version changed columns, and to what). */
  def history(spark: SparkSession, root: String): DataFrame = {
    val f = fs(spark, root)
    val rows = versions(spark, root).map { v =>
      val files = f.listStatus(new Path(dir(root, v)))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      Row(v, files.length.toLong, files.map(_.getLen).sum,
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(
          files.map(_.getModificationTime).maxOption.getOrElse(0L))),
        // empty version (no footers) ⇒ no inferable schema; "" keeps
        // history listable instead of throwing on the whole table
        if (hasData(f, root, v))
          spark.read.parquet(dir(root, v)).schema.toDDL
        else "")
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("modified", TimestampType, nullable = false),
        StructField("schema_ddl", StringType, nullable = false))))
  }

  /** VACUUM analog: drop all but the newest `keepLast` versions;
    * returns the committed versions deleted. Never touches the
    * latest. Also sweeps crashed writes — claimed numbers that never
    * committed (no `_SUCCESS`) — but only when the claim marker is
    * older than `claimTtlMs`, because a *slower concurrent writer*
    * can legitimately hold a lower number than the newest committed
    * version while its job is still running. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
             claimTtlMs: Long = 24L * 3600 * 1000): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val f = fs(spark, root)
    val committed = versions(spark, root)
    val drop = committed.dropRight(keepLast)
    drop.foreach { v =>
      f.delete(new Path(dir(root, v)), true)
      f.delete(claim(root, v), false)
    }
    val cutoff = System.currentTimeMillis() - claimTtlMs
    committed.lastOption.foreach { newest =>
      (0L until newest).filterNot(committed.contains).foreach { v =>
        val c = claim(root, v)
        if (f.exists(c) && f.getFileStatus(c).getModificationTime < cutoff) {
          f.delete(new Path(dir(root, v)), true)
          f.delete(new Path(dir(root, v) + ".building"), true)
          f.delete(c, false)
        }
      }
    }
    // stranded `v=N.building` temp siblings (a write that crashed
    // mid-parquet, including one whose number later got re-listed as
    // committed by a successful retry) — swept on the same TTL so a
    // LIVE writer's in-flight temp is never deleted under it
    f.listStatus(new Path(root)).toSeq.foreach { s =>
      if (s.isDirectory && s.getPath.getName.matches("^v=\\d+\\.building$")
          && s.getModificationTime < cutoff)
        f.delete(s.getPath, true)
    }
    drop
  }

  /** OPTIMIZE analog: rewrite the latest version's data as a NEW
    * compacted version targeting `targetFileMB` files (readers of the
    * old version are untouched; vacuum reclaims it later). Returns
    * the new version. */
  def optimize(spark: SparkSession, root: String,
               targetFileMB: Int = 512): Long = {
    require(targetFileMB >= 1, "targetFileMB must be >= 1")
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versions under $root")
    val f = fs(spark, root)
    val bytes = f.listStatus(new Path(dir(root, vs.last)))
      .filter(_.isFile).map(_.getLen).sum
    // ceiling: 1023 MB at target 512 → 2 files of ~512, not one ~1 GB
    val target = targetFileMB * 1024L * 1024L
    val files = math.max(1L, (bytes + target - 1) / target).toInt
    // read fully before writing: the source is a different directory,
    // so this is a plain distributed parquet->parquet rewrite;
    // write() claims the number, so optimize is concurrency-safe too
    val src = latest(spark, root).repartition(files)
    write(src, root)
  }

  /** OPTIMIZE with LAYOUT — the Delta `OPTIMIZE ... ZORDER BY`
    * analog, completing what [[optimize]]'s plain compaction loses:
    * the latest version rewrites into ~`targetFileMB` files
    * range-sorted on `layoutCols` (or Z-ORDER tiled across them when
    * `zOrder` and 2+ columns — narrow per-file min/max in EVERY
    * clustered column), commits as the next version, and a
    * [[graft.io.DataSkipping]] stats frame commits INSIDE the new
    * version directory — so the compacted table serves pruned reads
    * immediately, and time travel keeps each version's stats with
    * it. Rows are untouched (same optimize contract); the layout and
    * stats only ever remove read work. Returns the new version. */
  def optimizeSorted(spark: SparkSession, root: String,
                     layoutCols: Seq[String], targetFileMB: Int = 512,
                     zOrder: Boolean = false,
                     extraStatsCols: Seq[String] = Nil,
                     minFiles: Int = 1): Long = {
    import org.apache.spark.sql.functions.col
    require(layoutCols.nonEmpty, "optimizeSorted needs layout columns")
    require(targetFileMB >= 1 && minFiles >= 1,
      "targetFileMB and minFiles must be >= 1")
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versions under $root")
    val f = fs(spark, root)
    val bytes = f.listStatus(new Path(dir(root, vs.last)))
      .filter(_.isFile).map(_.getLen).sum
    val target = targetFileMB * 1024L * 1024L
    // minFiles: a parallelism/selectivity floor — a small table still
    // wants enough files that a range predicate can skip some
    val files = math.max(minFiles.toLong,
      (bytes + target - 1) / target).toInt
    val src = latest(spark, root)
    val laid =
      if (zOrder && layoutCols.size >= 2) {
        require(!src.columns.contains("__z"),
          "column name __z is reserved")
        val typed = layoutCols.map(c => c -> src.schema(c).dataType)
        src.withColumn("__z",
            graft.io.DataSkipping.zOrderValue(src, typed))
          .repartitionByRange(files, col("__z"))
          .sortWithinPartitions("__z").drop("__z")
      } else
        src.repartitionByRange(files, layoutCols.map(col): _*)
          .sortWithinPartitions(layoutCols.map(col): _*)
    val v = write(laid, root)
    graft.io.DataSkipping.writeStats(spark, dir(root, v),
      (layoutCols ++ extraStatsCols).distinct)
    v
  }
}
