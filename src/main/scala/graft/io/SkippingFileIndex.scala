package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or,
  StartsWith}
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CATALYST-INTEGRATED data skipping — the [[DataSkipping]] stats
  * frame served through Spark's own planning, so `spark.read`-shaped
  * queries prune files without the caller composing
  * [[DataSkipping.prunedRead]] by hand (the r14 verdict's #2 ask:
  * "queries that go through plain spark.read don't skip unless the
  * caller remembers to").
  *
  * [[SkippingFileIndex.read]] builds a DataFrame over a custom
  * [[FileIndex]]; at planning time Catalyst hands the scan's pushed
  * data filters to [[SkippingFileIndex.listFiles]], which translates
  * the supported shapes (=, <, <=, >, >=, IN, IS NULL, IS NOT NULL,
  * AND, OR over a stats column vs a literal) into min/max/nullCount
  * verdicts over the COMMITTED stats and returns only the surviving
  * files. Everything else about the scan is stock Spark — parquet
  * row-group pruning, predicate pushdown, and column pruning all
  * still apply on the survivors, and the skip COMPOSES with them in
  * one plan instead of living in a side channel.
  *
  * The same conservatism contract as [[DataSkipping]], per conjunct:
  * an untranslatable conjunct (expression shape, untracked column,
  * unsupported literal type, NaN bound, null literal) keeps ALL
  * files; a file the stats frame has never seen (late append,
  * foreign writer) is always kept; null min/max keep the file. The
  * pruning can only remove whole files whose stats PROVE no row can
  * match — the scan's own filters still run on every surviving row,
  * so a missed prune costs I/O, never rows.
  *
  * Scale shape: the stats land on the DRIVER once per index (one row
  * per file — the same Delta-checkpoint-sized list every Spark
  * FileIndex already holds; ~400k rows at 100 TB) and each query's
  * prune is an in-memory pass over that list at plan time — no Spark
  * job, no data scan, unlike `prunedRead`'s stats-frame job.
  *
  * FLAT stores only (the [[DataSkipping.writeSorted]] /
  * `writeZOrderedWithStats` layouts): `partitionSchema` is empty, so
  * directory-partition columns do NOT resolve here —
  * [[PartitionedStore]] remains the hive-layout path. */
final class SkippingFileIndex(spark: SparkSession, dir: String)
    extends FileIndex {

  import SkippingFileIndex._

  // one row per data file; (re)loaded at construction and refresh()
  private var (allFiles, statsByFile, colTypes):
      (Seq[FileStatus], Map[String, FileStats], Map[String, DataType]) =
    load(spark, dir)

  override def rootPaths: Seq[Path] = Seq(new Path(dir))

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = allFiles.map(_.getLen).sum

  override def inputFiles: Array[String] =
    allFiles.map(_.getPath.toString).toArray

  override def refresh(): Unit = {
    val reloaded = load(spark, dir)
    allFiles = reloaded._1; statsByFile = reloaded._2
    colTypes = reloaded._3
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    // every pushed conjunct prunes independently; one that doesn't
    // translate simply prunes nothing (keep-if-maybe)
    val preds = dataFilters.flatMap(translate(_, colTypes))
    val kept =
      if (preds.isEmpty) allFiles
      else allFiles.filter { st =>
        statsByFile.get(st.getPath.toString) match {
          case None => true // unknown file: structural conservatism
          case Some(fs) => preds.forall(_.keep(fs))
        }
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

object SkippingFileIndex {

  /** One file's stats: row count + per tracked column
    * (min, max, nullCount) — None = no usable bound, keep. */
  final case class FileStats(
      rows: Long,
      cols: Map[String, (Option[Any], Option[Any], Option[Long])])

  /** The driver-side keep-verdict algebra — the Scala evaluation of
    * [[DataSkipping.keepCondition]]'s Column form, run at PLAN time
    * over the in-memory stats list. */
  private[io] sealed trait FilePred { def keep(fs: FileStats): Boolean }
  private[io] final case class GeP(c: String, v: Any, strict: Boolean,
                               dt: DataType) extends FilePred {
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (_, Some(mx), _) =>
        val d = DataSkipping.cmp(mx, v, dt); if (strict) d > 0 else d >= 0
      case _ => true
    }
  }
  private[io] final case class LeP(c: String, v: Any, strict: Boolean,
                               dt: DataType) extends FilePred {
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (Some(mn), _, _) =>
        val d = DataSkipping.cmp(mn, v, dt); if (strict) d < 0 else d <= 0
      case _ => true
    }
  }
  private[io] final case class AndP(l: FilePred, r: FilePred)
      extends FilePred {
    def keep(fs: FileStats): Boolean = l.keep(fs) && r.keep(fs)
  }
  private[io] final case class OrP(l: FilePred, r: FilePred)
      extends FilePred {
    def keep(fs: FileStats): Boolean = l.keep(fs) || r.keep(fs)
  }
  private[io] final case class NullP(c: String) extends FilePred {
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (_, _, Some(nulls)) => nulls > 0
      case _ => true
    }
  }
  private[io] final case class NotNullP(c: String) extends FilePred {
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (_, _, Some(nulls)) => nulls < fs.rows
      case _ => true
    }
  }
  /** `col IN (vs)` against a file's [min, max]: keep iff ANY member
    * falls inside the bounds. `vs` is sorted (stats order, see
    * [[DataSkipping.cmp]]) and deduplicated, so the verdict is one
    * binary search per file — O(log values), not O(values): a
    * join-driven runtime filter routinely carries thousands of keys
    * (every key of the dim's selected slice), and the Or-of-equals
    * expansion would make each file's verdict linear in that. */
  private[io] final case class InP(c: String, vs: Array[Any],
                                   dt: DataType) extends FilePred {
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (Some(mn), Some(mx), _) =>
        var lo = 0
        var hi = vs.length
        while (lo < hi) { // least member >= min
          val mid = (lo + hi) >>> 1
          if (DataSkipping.cmp(vs(mid), mn, dt) < 0) lo = mid + 1
          else hi = mid
        }
        lo < vs.length && DataSkipping.cmp(vs(lo), mx, dt) <= 0
      case _ => true
    }
  }

  /** Sort + dedupe IN-list members into [[InP]]'s searchable form. */
  private[io] def inPred(c: String, members: Seq[Any],
                         dt: DataType): FilePred =
    InP(c,
      members.distinct.sortWith(DataSkipping.cmp(_, _, dt) < 0).toArray,
      dt)

  /** `col LIKE 'p%'` over a string column — the same prefix-bounds
    * test Spark's own parquet pushdown runs: a file may hold a
    * p-prefixed string iff max >= p (full byte compare: every
    * p-prefixed string is >= p) and the first |p| BYTES of min are
    * <= p (a min whose prefix already exceeds p bounds every row
    * above all p-prefixed strings). UTF-8 byte order throughout —
    * the order the stats were merged in. */
  private[io] final case class StartsWithP(c: String, prefix: String)
      extends FilePred {
    private val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    private def bytes(s: Any) = s.asInstanceOf[String]
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def keep(fs: FileStats): Boolean = fs.cols.get(c).forall {
      case (Some(mn), Some(mx), _) =>
        val mnb = bytes(mn)
        val mnPre = java.util.Arrays.copyOf(mnb, math.min(mnb.length, p.length))
        java.util.Arrays.compareUnsigned(bytes(mx), p) >= 0 &&
          java.util.Arrays.compareUnsigned(mnPre, p) <= 0
      case _ => true
    }
  }

  /** Catalyst INTERNAL literal → the stats frame's external value.
    * None = don't prune on this literal (null, NaN — mirroring
    * [[DataSkipping.keepCondition]]'s NaN refusal — or a type the
    * stats don't carry). Shared with [[SkipDataSource]]'s
    * partition-value conversion (partition values are InternalRow
    * members — the same internal forms). */
  private[io] def external(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case StringType => Some(v.asInstanceOf[UTF8String].toString)
      case DateType => Some(java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        Some(ts)
      case TimestampNTZType =>
        val us = v.asInstanceOf[Long]
        Some(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN) None else Some(f)
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) None else Some(d)
      case ByteType | ShortType | IntegerType | LongType => Some(v)
      case _ => None
    }

  /** A tracked column attribute vs a literal, either side. */
  private object ColLit {
    def unapply(args: (Expression, Expression, Map[String, DataType]))
        : Option[(String, Any, DataType, Boolean)] = args match {
      case (a: Attribute, Literal(v, dt), types)
          if types.get(a.name).contains(dt) =>
        external(v, dt).map(ev => (a.name, ev, dt, false))
      case (Literal(v, dt), a: Attribute, types)
          if types.get(a.name).contains(dt) =>
        external(v, dt).map(ev => (a.name, ev, dt, true))
      case _ => None
    }
  }

  /** Translate one pushed conjunct; None = shape not decidable by
    * file stats — prune nothing for it. `flipped` = the literal was
    * on the LEFT (lit < col ≡ col > lit). */
  private[io] def translate(e: Expression,
                            types: Map[String, DataType])
      : Option[FilePred] = e match {
    case EqualTo(l, r) => ColLit.unapply((l, r, types)).map {
      case (c, v, dt, _) =>
        AndP(GeP(c, v, strict = false, dt), LeP(c, v, strict = false, dt))
    }
    case GreaterThan(l, r) => ColLit.unapply((l, r, types)).map {
      case (c, v, dt, false) => GeP(c, v, strict = true, dt)
      case (c, v, dt, true) => LeP(c, v, strict = true, dt)
    }
    case GreaterThanOrEqual(l, r) => ColLit.unapply((l, r, types)).map {
      case (c, v, dt, false) => GeP(c, v, strict = false, dt)
      case (c, v, dt, true) => LeP(c, v, strict = false, dt)
    }
    case LessThan(l, r) => ColLit.unapply((l, r, types)).map {
      case (c, v, dt, false) => LeP(c, v, strict = true, dt)
      case (c, v, dt, true) => GeP(c, v, strict = true, dt)
    }
    case LessThanOrEqual(l, r) => ColLit.unapply((l, r, types)).map {
      case (c, v, dt, false) => LeP(c, v, strict = false, dt)
      case (c, v, dt, true) => GeP(c, v, strict = false, dt)
    }
    case StartsWith(a: Attribute, Literal(v, StringType))
        if types.get(a.name).contains(StringType) && v != null =>
      Some(StartsWithP(a.name, v.asInstanceOf[UTF8String].toString))
    case IsNull(a: Attribute) if types.contains(a.name) =>
      Some(NullP(a.name))
    case IsNotNull(a: Attribute) if types.contains(a.name) =>
      Some(NotNullP(a.name))
    case In(a: Attribute, list)
        if types.contains(a.name) && list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
      val dt = types(a.name)
      val members = list.map { case Literal(v, ldt) =>
        if (ldt != dt) None else external(v, ldt)
      }
      // ANY null/untranslatable member poisons the IN (could match
      // rows the bounds don't see) — keep everything
      if (members.exists(_.isEmpty)) None
      else Some(inPred(a.name, members.flatten, dt))
    case And(l, r) =>
      (translate(l, types), translate(r, types)) match {
        case (Some(a), Some(b)) => Some(AndP(a, b))
        case (one, other) => one.orElse(other) // half an AND still prunes
      }
    case Or(l, r) =>
      // an OR prunes only if BOTH arms translate
      for { a <- translate(l, types); b <- translate(r, types) }
        yield OrP(a, b)
    case _ => None
  }

  /** Load the committed stats for `dir` as driver-side maps:
    * file → [[FileStats]] and tracked column → type. Empty maps when
    * no frame is committed (no pruning, never an error). */
  private[io] def loadStats(spark: SparkSession, dir: String)
      : (Map[String, FileStats], Map[String, DataType]) =
    DataSkipping.statsFrame(spark, dir) match {
      case None => (Map.empty, Map.empty)
      case Some(sf) =>
        val cols = sf.schema.fieldNames.toSeq
          .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        val types = cols.map(c =>
          c -> sf.schema(s"min_$c").dataType).toMap
        val fileIdx = sf.schema.fieldIndex("file")
        val rowsIdx = sf.schema.fieldIndex("rows")
        val stats = sf.collect().map { r =>
          val byCol = cols.map { c =>
            val mn = r.get(sf.schema.fieldIndex(s"min_$c"))
            val mx = r.get(sf.schema.fieldIndex(s"max_$c"))
            val nl = r.get(sf.schema.fieldIndex(s"nulls_$c"))
            c -> (Option(mn), Option(mx),
              Option(nl).map(_.asInstanceOf[Long]))
          }.toMap
          r.getString(fileIdx) -> FileStats(r.getLong(rowsIdx), byCol)
        }.toMap
        (stats, types)
    }

  /** Load (files, stats-by-file, tracked column types) for `dir`. */
  private def load(spark: SparkSession, dir: String)
      : (Seq[FileStatus], Map[String, FileStats],
         Map[String, DataType]) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Seq.newBuilder[FileStatus]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet")) files += s
      }
    }
    walk(root)
    val (stats, types) = loadStats(spark, dir)
    (files.result(), stats, types)
  }

  /** Read `dir` through the skipping index: a stock parquet relation
    * whose file listing is stats-pruned at PLAN time from the pushed
    * filters. Same superset contract as `prunedRead`; same rows as
    * `spark.read.parquet(dir).where(...)` by construction (the
    * filters still run). The committed data schema rides the index
    * (no footer inference on the read path).
    *
    * SNAPSHOT-SCOPED (here and in [[readPartitioned]]): the file
    * list and stats load at construction, so a frame held across a
    * concurrent append serves the construction-time file set — the
    * right isolation over [[graft.etl.VersionStore]]'s immutable
    * version directories (`latestIndexed` hands out one version), but
    * NOT a live view of a mutable flat store: re-read (or call the
    * index's `refresh()`) to see files appended after construction. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = DataSkipping.committedSchema(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)
    val classic = spark.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    classic.baseRelationToDataFrame(
      HadoopFsRelation(
        location = new SkippingFileIndex(spark, dir),
        partitionSchema = StructType(Nil),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(classic))
  }

  /** Read a HIVE-PARTITIONED root (`dir/p=v/…`, the
    * [[PartitionedStore]] layout) with BOTH prunings in one index:
    * Spark's own partition discovery + directory pruning (inherited
    * from `InMemoryFileIndex`) and the committed per-file stats
    * verdicts layered on the surviving directories' files. A
    * predicate on the partition column drops whole directories, a
    * predicate on a tracked data column drops files inside the kept
    * directories, and both compose with parquet row-group pruning in
    * the same plan. Stats conservatism is unchanged (unknown files /
    * opaque conjuncts keep). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val classic = spark.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    val index = new SkippingPartitionedFileIndex(classic, dir)
    val partSchema = index.partitionSchema
    val full = DataSkipping.committedSchema(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)
    val dataSchema = StructType(
      full.fields.filterNot(f => partSchema.fieldNames.contains(f.name)))
    classic.baseRelationToDataFrame(
      HadoopFsRelation(
        location = index,
        partitionSchema = partSchema,
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(classic))
  }
}

/** The hive-partitioned sibling of [[SkippingFileIndex]]: Spark's
  * `InMemoryFileIndex` does the partition discovery and
  * partition-filter pruning it already does best; this subclass
  * post-filters each surviving directory's FILE list through the
  * committed [[DataSkipping]] stats, translated from the scan's
  * pushed data filters — the Delta read path's two-level prune
  * (partitions, then file stats) in one Catalyst index. */
final class SkippingPartitionedFileIndex(
    session: org.apache.spark.sql.classic.SparkSession, dir: String)
  extends InMemoryFileIndex(session, Seq(new Path(dir)),
    Map.empty[String, String], None) {

  import SkippingFileIndex.{loadStats, translate}

  private var (statsByFile, colTypes) = loadStats(session, dir)

  /** Reload BOTH the inherited file/partition listing and the stats
    * maps — without this, a frame held across a concurrent
    * append/refreshStats would keep serving the construction-time
    * file list (missing new files: FEWER rows than a fresh read,
    * unlike stats staleness, which is merely conservative). */
  override def refresh(): Unit = {
    super.refresh()
    val reloaded = loadStats(session, dir)
    statsByFile = reloaded._1; colTypes = reloaded._2
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    val preds = dataFilters.flatMap(translate(_, colTypes))
    if (preds.isEmpty || statsByFile.isEmpty) dirs
    else dirs.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        statsByFile.get(f.fileStatus.getPath.toString)
          .forall(fs => preds.forall(_.keep(fs)))
      })
    }
  }
}
