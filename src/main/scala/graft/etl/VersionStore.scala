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

  /** Committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case VersionDir(n) => Some(n.toLong)
          case _             => None
        }
    }.flatten.sorted
  }

  private def dir(root: String, v: Long) = s"$root/v=$v"

  /** Append `df` as the next version; returns its number. */
  def write(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, root).lastOption.fold(0L)(_ + 1)
    df.write.mode("errorifexists").parquet(dir(root, next))
    next
  }

  def asOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    require(versions(spark, root).contains(version),
      s"version $version not present under $root")
    spark.read.parquet(dir(root, version))
  }

  def latest(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versions under $root")
    spark.read.parquet(dir(root, vs.last))
  }

  /** DESCRIBE HISTORY analog: (version, n_files, bytes, modified). */
  def history(spark: SparkSession, root: String): DataFrame = {
    val f = fs(spark, root)
    val rows = versions(spark, root).map { v =>
      val files = f.listStatus(new Path(dir(root, v)))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      Row(v, files.length.toLong, files.map(_.getLen).sum,
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(
          files.map(_.getModificationTime).maxOption.getOrElse(0L))))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("modified", TimestampType, nullable = false))))
  }

  /** VACUUM analog: drop all but the newest `keepLast` versions;
    * returns what was deleted. Never touches the latest. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val f = fs(spark, root)
    val drop = versions(spark, root).dropRight(keepLast)
    drop.foreach(v => f.delete(new Path(dir(root, v)), true))
    drop
  }

  /** OPTIMIZE analog: rewrite the latest version's data as a NEW
    * compacted version targeting `targetFileMB` files (readers of the
    * old version are untouched; vacuum reclaims it later). Returns
    * the new version. */
  def optimize(spark: SparkSession, root: String,
               targetFileMB: Int = 512): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versions under $root")
    val f = fs(spark, root)
    val bytes = f.listStatus(new Path(dir(root, vs.last)))
      .filter(_.isFile).map(_.getLen).sum
    val files =
      math.max(1L, bytes / (targetFileMB * 1024L * 1024L)).toInt
    val next = vs.last + 1
    // read fully before writing: the source is a different directory,
    // so this is a plain distributed parquet->parquet rewrite
    latest(spark, root).repartition(files)
      .write.mode("errorifexists").parquet(dir(root, next))
    next
  }
}
