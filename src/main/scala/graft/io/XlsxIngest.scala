package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed xlsx ingest — the missing half of the reference's
  * ingest story: every SharePoint pull converts each workbook to CSV
  * before parsing (`pd.read_excel(...)` then `to_csv(...)`,
  * code/download_from_sharepoint.py:139,154). There is no POI in this
  * environment, so this is a from-scratch reader of the public
  * OOXML/SpreadsheetML format (ECMA-376): an xlsx file is a ZIP
  * holding XML parts — `xl/workbook.xml` (sheet names),
  * `xl/sharedStrings.xml` (the string table), `xl/worksheets/
  * sheetN.xml` (rows of cells). JDK `ZipInputStream` + StAX parse it
  * with no extra dependency.
  *
  * Scale shape: workbooks load through Spark's `binaryFile` source —
  * one task per file, the parse runs on executors (`flatMap` over the
  * file bytes), so a drop of thousands of workbooks converts in
  * parallel and the driver never sees file contents. This mirrors the
  * reference's unit of work (one xlsx per SharePoint item) without
  * its driver-side loop. A single workbook must fit in one task's
  * memory — the xlsx container is not splittable (ZIP + XML), same
  * constraint pandas has; at 100 TB the input is *many* such files,
  * not one huge one.
  *
  * Cell semantics covered: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula-cached strings (`t="str"`), booleans
  * (`t="b"` → "true"/"false"), and numbers (raw `<v>` text, as
  * `pd.read_excel(..., dtype=str)`-style passthrough). Date cells are
  * stored by Excel as serial numbers + a style; styles are not
  * resolved — callers cast columns with Spark expressions, the same
  * place the reference casts its CSV (ukg_dept_bus_strctr.py:46-63).
  */
object XlsxIngest {

  /** One parsed sheet row: source file, sheet name, 1-based row index,
    * and the cells as a dense string array (nulls for gaps — xlsx
    * stores cells sparsely with A1-style addresses). */
  private val rowSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("sheet", StringType, nullable = false),
    StructField("sheet_idx", IntegerType, nullable = false),
    StructField("row_idx", LongType, nullable = false),
    StructField("cells", ArrayType(StringType, containsNull = true),
      nullable = false)))

  /** Column letters of an A1 cell ref → 0-based column index
    * ("A"→0, "AA"→26). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Parse one workbook's bytes → (sheet, sheetIdx, rowIdx, cells)
    * tuples. Pure function of the bytes — runs inside executor
    * tasks. */
  private[graft] def parseWorkbook(bytes: Array[Byte])
      : Seq[(String, Int, Long, Array[String])] = {
    // one pass over the ZIP: collect the parts we need by name
    val parts = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "xl/workbook.xml" || n == "xl/sharedStrings.xml" ||
          n == "xl/_rels/workbook.xml.rels" ||
          (n.startsWith("xl/worksheets/") && n.endsWith(".xml")))
          parts(n) = zin.readAllBytes()
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()

    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    // hardening: never resolve DTDs/external entities from cell data
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)

    def reader(part: Array[Byte]) =
      factory.createXMLStreamReader(new ByteArrayInputStream(part))

    // shared string table: <si> items, each one or more <t> runs
    val shared = mutable.ArrayBuffer.empty[String]
    parts.get("xl/sharedStrings.xml").foreach { p =>
      val r = reader(p)
      val sb = new StringBuilder
      var inSi = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "si") { inSi = true; sb.clear() }
            else if (inSi && r.getLocalName == "t")
              sb.append(r.getElementText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "si") { shared += sb.toString; inSi = false }
          case _ =>
        }
      }
      r.close()
    }

    // sheet name → relationship id (workbook.xml), rid → part target
    // (workbook.xml.rels); fall back to order if rels are absent
    val sheetRids = mutable.ArrayBuffer.empty[(String, String)]
    parts.get("xl/workbook.xml").foreach { p =>
      val r = reader(p)
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          var name = ""; var rid = ""
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "name" => name = r.getAttributeValue(i)
              case "id"   => rid = r.getAttributeValue(i)
              case _      =>
            }
          }
          sheetRids += ((name, rid))
        }
      }
      r.close()
    }
    val ridTarget = mutable.Map.empty[String, String]
    parts.get("xl/_rels/workbook.xml.rels").foreach { p =>
      val r = reader(p)
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          var id = ""; var target = ""
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "Id"     => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _        =>
            }
          }
          ridTarget(id) = target
        }
      }
      r.close()
    }
    def sheetPart(rid: String, order: Int): Option[Array[Byte]] = {
      val byRel = ridTarget.get(rid).map { t =>
        val clean = t.stripPrefix("/xl/").stripPrefix("xl/")
        s"xl/$clean"
      }
      byRel.flatMap(parts.get)
        .orElse(parts.get(s"xl/worksheets/sheet${order + 1}.xml"))
    }

    // worksheet rows: <row r="N"> of <c r="A1" t="s|str|b|inlineStr">
    // with value in <v> (or <is><t> runs for inline strings). Text
    // accumulates in `buf` and converts once at the element's END —
    // StAX may split one text node into several CHARACTERS events at
    // buffer boundaries, and converting per chunk would index the
    // shared-string table with a *partial* number.
    val out = mutable.ArrayBuffer.empty[(String, Int, Long, Array[String])]
    sheetRids.zipWithIndex.foreach { case ((sheetName, rid), order) =>
      sheetPart(rid, order).foreach { p =>
        val r = reader(p)
        var rowIdx = 0L
        var cells = mutable.ArrayBuffer.empty[String]
        var cellCol = 0
        var cellType = ""
        var inV = false
        var inIsT = false
        val buf = new StringBuilder
        def writeCell(v: String): Unit = {
          while (cells.length <= cellCol) cells += null
          cells(cellCol) = Option(cells(cellCol)).getOrElse("") + v
        }
        while (r.hasNext) {
          r.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" =>
                  cells = mutable.ArrayBuffer.empty[String]
                  rowIdx = Option(r.getAttributeValue(null, "r"))
                    .map(_.toLong).getOrElse(rowIdx + 1)
                case "c" =>
                  cellCol = Option(r.getAttributeValue(null, "r"))
                    .map(colIndex).getOrElse(cells.length)
                  cellType = Option(r.getAttributeValue(null, "t"))
                    .getOrElse("")
                case "v" => inV = true; buf.clear()
                case "t" if cellType == "inlineStr" =>
                  inIsT = true; buf.clear()
                case _ =>
              }
            case javax.xml.stream.XMLStreamConstants.CHARACTERS
                if inV || inIsT =>
              buf.append(r.getText)
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" =>
                  val raw = buf.toString
                  writeCell(cellType match {
                    case "s" => shared(raw.trim.toInt)
                    case "b" => if (raw.trim == "1") "true" else "false"
                    case _   => raw
                  })
                  inV = false
                case "t" if inIsT =>
                  // rich inline strings hold several <t> runs —
                  // appending each run preserves the full text
                  writeCell(buf.toString)
                  inIsT = false
                case "row" if cells.nonEmpty =>
                  out += ((sheetName, order, rowIdx, cells.toArray))
                case _ =>
              }
            case _ =>
          }
        }
        r.close()
      }
    }
    out.toSeq
  }

  /** Raw distributed read: every row of every sheet of every workbook
    * under `path` (glob ok) as (path, sheet, sheet_idx, row_idx,
    * cells) — `sheet_idx` is the workbook-order position, 0 = first
    * sheet. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val enc = org.apache.spark.sql.Encoders.row(rowSchema)
    bin.flatMap { row =>
      val p = row.getString(0)
      parseWorkbook(row.getAs[Array[Byte]](1)).map {
        case (sheet, sheetIdx, idx, cells) => Row(p, sheet, sheetIdx, idx, cells)
      }
    }(enc)
  }

  /** The reference's conversion: first sheet, first row is the
    * header, remaining rows become string columns named by it —
    * exactly what lands in the CSV that `pd.read_excel().to_csv()`
    * produces, ready for the same cast/cleanse steps as
    * `CsvIngest.read`. `schema` columns are matched to header cells
    * by (case-insensitive, trimmed) name and cast; headers absent
    * from the file come back null.
    */
  def readTable(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    // only the FIRST sheet participates — secondary sheets ("Notes",
    // scratch tabs) must not leak rows into the table
    val raw = read(spark, path).where(col("sheet_idx") === 0)
    // header = the first populated row (min row_idx — a blank or
    // skipped first row must not fail the read) of the
    // lexicographically-first path: deterministic run-to-run, unlike
    // a bare limit(1) over an unordered glob. Headers must agree
    // across files (the reference re-reads one report layout).
    val header = raw.orderBy(col("path"), col("row_idx"))
      .select(col("cells")).limit(1).collect()
    require(header.nonEmpty, s"no header row found in $path")
    val names = header(0).getSeq[String](0).map(h =>
      Option(h).map(_.trim.toLowerCase).getOrElse(""))
    // each file drops its OWN header row (its min row_idx) — with
    // multiple workbooks, "row_idx > 1" would leak every other file's
    // header in as data whenever a file's header doesn't sit at row 1
    val byFile = org.apache.spark.sql.expressions.Window.partitionBy("path")
    val body = raw
      .withColumn("__hdr_idx", min(col("row_idx")).over(byFile))
      .where(col("row_idx") > col("__hdr_idx"))
    schema.fields.foldLeft(body) { (df, f) =>
      val at = names.indexOf(f.name.trim.toLowerCase)
      val raw = if (at >= 0) col("cells").getItem(at) else lit(null)
      df.withColumn(f.name, raw.cast(f.dataType))
    }.select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Excel date-serial → timestamp, pure column arithmetic — the
    * piece `readTable`'s dtype=str-style passthrough leaves to the
    * caller (the reference parses `M/dd/yyyy` CSV text because pandas
    * resolved serials+styles during `read_excel`; here the serial
    * arrives as a number string and this resolves it).
    *
    * Excel's epoch: serial 1 = 1900-01-01, but the format inherits
    * Lotus 1-2-3's leap bug — it believes 1900-02-29 existed (serial
    * 60), so real serials ≥ 61 are one day ahead of the naive count.
    * Serial 60 itself names a day that never happened and resolves to
    * 1900-03-01 here (same as serial 61 — the choice POI documents as
    * "invalid"; no real workbook date hits it). The fractional part
    * is the time of day, rounded to the nearest second (Excel's
    * binary fractions carry ~microsecond noise; sub-second times
    * aren't representable in the UI anyway). NULL serials stay NULL;
    * the session timezone decides the wall-clock reading, as with any
    * Spark timestamp.
    */
  def excelSerialToTimestamp(serial: Column): Column = {
    val days = floor(serial).cast("long")
    // days since 1900-01-01: pre-bug serials shift by the epoch only,
    // post-bug serials also drop the phantom 1900-02-29
    val adj = when(days >= lit(61L), days - 2).otherwise(days - 1)
    val date = date_add(to_date(lit("1900-01-01")), adj.cast("int"))
    val secs = round((serial - floor(serial)) * 86400).cast("double")
    date.cast("timestamp") + make_dt_interval(lit(0), lit(0), lit(0), secs)
  }
}
