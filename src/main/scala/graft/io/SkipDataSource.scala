package graft.io

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{
  Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DYNAMIC FILE PRUNING — the Delta "dynamic file pruning" analog,
  * and the r15 verdict's top ask: a runtime JOIN-DERIVED filter (not
  * just a plan-time literal) driving the per-file min/max verdicts.
  *
  * [[SkippingFileIndex]] prunes from literal predicates at PLAN time;
  * a star join's most selective predicate, though, often lives on the
  * DIMENSION (the reference's census↔dim-snapshot join,
  * ukg_open_census.py:331-352): the fact-side key set is only known
  * after the dim's filter runs. Spark's own machinery handles exactly
  * this for DataSource-V2 scans — the optimizer's PartitionPruning
  * rule plants a DynamicPruningSubquery against any V2 scan whose
  * [[SupportsRuntimeFiltering.filterAttributes]] cover the join key,
  * and BatchScanExec delivers the build side's collected key set to
  * [[SupportsRuntimeFiltering.filter]] at EXECUTION time, then
  * replans the scan's input partitions. This source declares the
  * committed stats columns as filterable, translates the delivered
  * `IN (keys…)` into the [[SkippingFileIndex]] verdict algebra
  * (binary search per file — the key set is dim-sized), and drops
  * every file whose [min, max] provably misses all keys.
  *
  * Everything below the file list is stock Spark: the scan IS a
  * [[ParquetScan]] (vectorized reader, row-group pruning from the
  * pushed filters, column pruning), built over a file index whose
  * listing honors the current keep-set. Conservatism is
  * [[DataSkipping]]'s: untranslatable filters, unknown files, and
  * null bounds keep; the engine re-applies every filter on the
  * surviving rows, so a missed prune costs I/O, never rows.
  *
  * Scale shape: the runtime verdict is a driver-side pass over the
  * stats list (one row per file — Delta-checkpoint sized) with an
  * O(log |keys|) probe per file; the key set is whatever DPP already
  * collected for the broadcast (dimension-sized). At 100 TB this is
  * the difference between scanning every fact file and scanning the
  * O(selected-dim-slice) files a clustered layout maps them to.
  *
  * Usage: `spark.read.format("graft.io.SkipDataSource").load(dir)`
  * over a [[DataSkipping.writeSortedWithStats]] /
  * `writeZOrderedWithStats` store, then join it — no explicit prune
  * calls. [[SkipScan.lastPrune]] records (total, kept-static,
  * kept-runtime) per directory for measured-suppression requires. */
final class SkipDataSource extends TableProvider {

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft.io.SkipDataSource needs a path: spark.read.format(...).load(dir)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    DataSkipping.committedSchema(spark, dir)
      .getOrElse(spark.read.parquet(dir).schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val dir = properties.get("path")
    require(dir != null && dir.nonEmpty,
      "graft.io.SkipDataSource needs a path")
    new SkipTable(dir, schema)
  }
}

private[io] final class SkipTable(dir: String, dataSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_skip($dir)"
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SkipScanBuilder(SparkSession.active, dir, dataSchema, options)
}

private[io] final class SkipScanBuilder(
    spark: SparkSession, dir: String, dataSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var filters: Array[sources.Filter] = Array.empty
  private var readSchema: StructType = dataSchema

  /** Remember every filter for file-stats pruning and parquet
    * row-group pushdown, and hand them ALL back as post-scan
    * residuals — the file-source contract: stats and row-group
    * bounds prove absence, never presence, so the engine must keep
    * re-evaluating on the survivors. */
  override def pushFilters(fs: Array[sources.Filter])
      : Array[sources.Filter] = { filters = fs; fs }
  override def pushedFilters(): Array[sources.Filter] = filters

  override def pruneColumns(required: StructType): Unit = {
    // preserve the data schema's field order (parquet reader contract)
    val keep = required.fieldNames.toSet
    val pruned = StructType(dataSchema.fields.filter(f => keep(f.name)))
    readSchema = if (pruned.isEmpty) StructType(Nil) else pruned
  }

  override def build(): Scan =
    new SkipScan(spark, dir, dataSchema, readSchema, filters, options)
}

/** The filterable scan. Mutable by design: [[filter]] is Spark's
  * runtime-filter delivery ([[SupportsRuntimeFiltering]]) and
  * narrows the keep-set; the inner [[ParquetScan]] is rebuilt so no
  * cached partition planning survives the narrowing. */
private[io] final class SkipScan(
    spark: SparkSession, dir: String, dataSchema: StructType,
    readDataSchema: StructType, pushed: Array[sources.Filter],
    options: CaseInsensitiveStringMap)
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportStatistics {

  import SkippingFileIndex.{FilePred, loadStats}

  private val classic =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
  private val (statsByFile, colTypes) = loadStats(spark, dir)

  // ONE listing for the scan's lifetime; runtime filters narrow the
  // keep-set on it instead of re-listing
  private val index = new KeepSetFileIndex(classic, dir)
  private val totalFiles = index.allDataFiles.size

  // plan-time prune from the pushed literal filters (parity with
  // SkippingFileIndex.read — a WHERE range/IN also prunes here)
  applyPreds(pushed.flatMap(SkipScan.translateV1(_, colTypes)))
  SkipScan.lastPrune.put(dir,
    SkipScan.Prune(totalFiles, index.keptCount, index.keptCount,
      runtimeFilterSeen = false))

  private def applyPreds(preds: Seq[FilePred]): Unit =
    if (preds.nonEmpty)
      index.narrow { st =>
        statsByFile.get(st.getPath.toString) match {
          case None => true // unknown file: structural conservatism
          case Some(fs) => preds.forall(_.keep(fs))
        }
      }

  // rebuilt on every filter() so no FileScan-internal caching of the
  // partition planning can serve a pre-narrowing file list
  private var inner: ParquetScan = mkInner()

  private def mkInner(): ParquetScan = ParquetScan(
    sparkSession = classic,
    hadoopConf = classic.sessionState.newHadoopConfWithOptions(
      options.asCaseSensitiveMap.asScala.toMap),
    fileIndex = index,
    dataSchema = dataSchema,
    readDataSchema = readDataSchema,
    readPartitionSchema = StructType(Nil),
    pushedFilters = pushed,
    options = options)

  // ---- SupportsRuntimeFiltering ------------------------------------
  override def filterAttributes(): Array[NamedReference] =
    colTypes.keys.toArray.sorted.map(Expressions.column)

  override def filter(runtime: Array[sources.Filter]): Unit = {
    applyPreds(runtime.flatMap(SkipScan.translateV1(_, colTypes)))
    inner = mkInner()
    SkipScan.lastPrune.get(dir).foreach(p => SkipScan.lastPrune.put(dir,
      p.copy(keptRuntime = index.keptCount, runtimeFilterSeen = true)))
  }

  // ---- Scan / Batch -------------------------------------------------
  override def readSchema(): StructType = readDataSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    inner.toBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(index.keptBytes)
    override def numRows(): OptionalLong = {
      val known = index.keptFiles.flatMap(f =>
        statsByFile.get(f.getPath.toString))
      if (known.size == index.keptCount)
        OptionalLong.of(known.map(_.rows).sum)
      else OptionalLong.empty()
    }
  }

  override def description(): String =
    s"GraftSkipScan $dir [${index.keptCount}/$totalFiles files]"
}

object SkipScan {

  /** Measured suppression per store dir: file counts before/after the
    * plan-time (literal) prune and after the last runtime
    * (join-driven) filter delivery — the in-query REQUIRE's witness
    * that the prune actually removed files this run. */
  final case class Prune(total: Int, keptStatic: Int, keptRuntime: Int,
                         runtimeFilterSeen: Boolean)
  val lastPrune = new scala.collection.concurrent.TrieMap[String, Prune]

  /** V1 `sources.Filter` → the file-stats verdict algebra. Same
    * per-conjunct conservatism as the Catalyst translation
    * ([[SkippingFileIndex.translate]]): None = not decidable by
    * min/max — prune nothing for it. V1 filter values are EXTERNAL
    * already (the engine converts before delivery); [[bound]] aligns
    * the java.time externals with the stats frame's java.sql ones
    * and refuses NaN and cross-type bounds. */
  private[io] def translateV1(
      f: sources.Filter, types: Map[String, DataType])
      : Option[SkippingFileIndex.FilePred] = {
    import SkippingFileIndex._
    f match {
      case sources.EqualTo(c, v) => bound(c, v, types).map { case (ev, dt) =>
        AndP(GeP(c, ev, strict = false, dt), LeP(c, ev, strict = false, dt))
      }
      case sources.EqualNullSafe(c, v) if v != null =>
        translateV1(sources.EqualTo(c, v), types)
      case sources.GreaterThan(c, v) =>
        bound(c, v, types).map { case (ev, dt) => GeP(c, ev, strict = true, dt) }
      case sources.GreaterThanOrEqual(c, v) =>
        bound(c, v, types).map { case (ev, dt) => GeP(c, ev, strict = false, dt) }
      case sources.LessThan(c, v) =>
        bound(c, v, types).map { case (ev, dt) => LeP(c, ev, strict = true, dt) }
      case sources.LessThanOrEqual(c, v) =>
        bound(c, v, types).map { case (ev, dt) => LeP(c, ev, strict = false, dt) }
      case sources.In(c, vs) if vs.nonEmpty =>
        val bounds = vs.toSeq.map(bound(c, _, types))
        // ANY null/untranslatable member poisons the IN — keep all
        if (bounds.exists(_.isEmpty)) None
        else Some(inPred(c, bounds.flatten.map(_._1), types(c)))
      case sources.IsNull(c) if types.contains(c) => Some(NullP(c))
      case sources.IsNotNull(c) if types.contains(c) => Some(NotNullP(c))
      case sources.StringStartsWith(c, p)
          if types.get(c).contains(StringType) && p != null =>
        Some(StartsWithP(c, p))
      case sources.And(l, r) =>
        (translateV1(l, types), translateV1(r, types)) match {
          case (Some(a), Some(b)) => Some(AndP(a, b))
          case (one, other) => one.orElse(other)
        }
      case sources.Or(l, r) =>
        for { a <- translateV1(l, types); b <- translateV1(r, types) }
          yield OrP(a, b)
      case _ => None
    }
  }

  /** Normalize a V1 filter value to the stats frame's external type
    * for `column`; None = no trustworthy bound (null, NaN, untracked
    * column, or a value class the column's type order can't compare). */
  private def bound(column: String, v: Any,
                    types: Map[String, DataType]): Option[(Any, DataType)] =
    types.get(column).flatMap { dt =>
      if (v == null) None
      else (dt, v) match {
        case (StringType, s: String) => Some((s, dt))
        case (ByteType, x: java.lang.Byte) => Some((x.byteValue, dt))
        case (ShortType, x: java.lang.Short) => Some((x.shortValue, dt))
        case (IntegerType, x: java.lang.Integer) => Some((x.intValue, dt))
        case (LongType, x: java.lang.Long) => Some((x.longValue, dt))
        case (FloatType, x: java.lang.Float) =>
          if (x.isNaN) None else Some((x.floatValue, dt))
        case (DoubleType, x: java.lang.Double) =>
          if (x.isNaN) None else Some((x.doubleValue, dt))
        case (DateType, d: java.sql.Date) => Some((d, dt))
        case (DateType, d: java.time.LocalDate) =>
          Some((java.sql.Date.valueOf(d), dt))
        case (TimestampType, t: java.sql.Timestamp) => Some((t, dt))
        case (TimestampType, t: java.time.Instant) =>
          Some((java.sql.Timestamp.from(t), dt))
        case (TimestampNTZType, t: java.time.LocalDateTime) => Some((t, dt))
        case _ => None
      }
    }
}

/** An [[InMemoryFileIndex]] over the store root whose listing honors
  * a narrowable keep-set: the directory lists ONCE (construction);
  * every [[SkipScan.filter]] delivery only shrinks the set, so
  * runtime pruning never pays a re-listing. Monotone by contract —
  * runtime filters are conjunctive, so narrowing is the only legal
  * direction. */
private[io] final class KeepSetFileIndex(
    session: org.apache.spark.sql.classic.SparkSession, dir: String)
  extends InMemoryFileIndex(session, Seq(new Path(dir)),
    Map.empty[String, String], None) {

  @volatile private var kept: Seq[org.apache.hadoop.fs.FileStatus] =
    allDataFiles

  def allDataFiles: Seq[org.apache.hadoop.fs.FileStatus] =
    allFiles().filter(f => f.getPath.getName.endsWith(".parquet"))

  def keptFiles: Seq[org.apache.hadoop.fs.FileStatus] = kept
  def keptCount: Int = kept.size
  def keptBytes: Long = math.max(1L, kept.map(_.getLen).sum)

  def narrow(keep: org.apache.hadoop.fs.FileStatus => Boolean): Unit =
    kept = kept.filter(keep)

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
    Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
      org.apache.spark.sql.catalyst.InternalRow.empty, kept.toArray))

  override def sizeInBytes: Long = keptBytes
}
