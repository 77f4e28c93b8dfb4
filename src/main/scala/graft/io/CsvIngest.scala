package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema'd CSV ingest with the reference's cleansing behaviors.
  *
  * The reference declares an explicit 14-column schema and casts/drops
  * rows with null keys (code/ukg_dept_bus_strctr.py:46-63, 36-39), and
  * separately rewrites raw census files on the driver before parsing
  * (code/ukg_open_census_file_cleanser.py:62, 86-88: bare-newline
  * repair, quote/comma strip, header drop). Both paths are distributed
  * here:
  *  - `read` — the straight schema'd reader (no driver round-trip;
  *    encoding such as cp1252/windows-1252 is a reader option, the
  *    JVM-charset analog of the reference's decode fallback);
  *  - `readCleansed` — the file-cleanser path: lines are read as
  *    text, repaired with the same `Cleanser` column expressions the
  *    reference applies in Python, then parsed with `from_csv`, so a
  *    100 TB drop of dirty CSVs never touches the driver.
  */
object CsvIngest {

  /** `encoding` is the JVM-charset analog of the reference's
    * utf-8→cp1252 decode fallback; Spark 4 allows iso-8859-1 (the
    * cp1252 superset-for-printables) out of the box and the full
    * windows-1252 set behind `spark.sql.legacy.javaCharsets=true`. */
  final case class Options(header: Boolean = true,
                           encoding: String = "UTF-8",
                           delimiter: String = ",",
                           keyCols: Seq[String] = Nil)

  /** Schema'd CSV reader: explicit schema (never inferSchema — an
    * extra full scan at scale), PERMISSIVE parse, null-key drop. */
  def read(spark: SparkSession, path: String, schema: StructType,
           opts: Options = Options()): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("header", opts.header.toString)
      .option("encoding", opts.encoding)
      .option("sep", opts.delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)
    if (opts.keyCols.isEmpty) df else df.na.drop(opts.keyCols)
  }

  /** The file-cleanser path, mirroring the reference's ladder
    * (ukg_open_census_file_cleanser.py:81-93: quote-aware csv parse
    * per line, then strip quotes/commas *inside* each field, then drop
    * the header row): text-line read → `from_csv` with the explicit
    * schema (quote-aware) → per-field `Cleanser.stripQuotesCommas` on
    * the string columns → header-row drop by value. All distributed —
    * the reference rewrites whole files through the driver.
    */
  def readCleansed(spark: SparkSession, path: String, schema: StructType,
                   opts: Options = Options()): DataFrame = {
    // header drop honors opts.header and tolerates quoted/CRLF header
    // lines (`"id","name"` or a trailing \r still match)
    val headerLine = schema.fieldNames.mkString(opts.delimiter)
    val lines = spark.read
      .option("encoding", opts.encoding)
      .text(path)
    val parsed = (if (opts.header)
        lines.where(
          regexp_replace(col("value"), "[\"\r]", "") =!= headerLine)
      else lines)
      .select(from_csv(col("value"), schema,
        Map("sep" -> opts.delimiter, "quote" -> "\"")).as("r"))
      .select(schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          Cleanser.stripQuotesCommas(col(s"r.${f.name}")).as(f.name)
        else col(s"r.${f.name}")
      }: _*)
    if (opts.keyCols.isEmpty) parsed else parsed.na.drop(opts.keyCols)
  }
}
