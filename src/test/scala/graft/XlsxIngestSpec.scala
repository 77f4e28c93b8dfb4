package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.XlsxIngest

/** The spec builds real xlsx containers (ZIP + SpreadsheetML XML, the
  * public ECMA-376 format) with the JDK alone — no POI in this
  * environment — covering shared strings, inline strings, booleans,
  * numbers, sparse cells, and multiple sheets/files. */
class XlsxIngestSpec extends GraftSuite {

  private def writeXlsx(dir: Path, name: String,
                        sheets: Seq[(String, String)],
                        sharedStrings: Seq[String]): Path = {
    val f = dir.resolve(name)
    val z = new ZipOutputStream(Files.newOutputStream(f))
    def put(entry: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(entry))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    val sheetDecls = sheets.zipWithIndex.map { case ((n, _), i) =>
      s"""<sheet name="$n" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$sheetDecls</sheets></workbook>""".stripMargin)
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")
    if (sharedStrings.nonEmpty)
      put("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${
          sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    sheets.zipWithIndex.foreach { case ((_, rowsXml), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""")
    }
    z.close()
    f
  }

  test("colIndex decodes A1 column letters") {
    assert(XlsxIngest.colIndex("A1") == 0)
    assert(XlsxIngest.colIndex("B7") == 1)
    assert(XlsxIngest.colIndex("Z2") == 25)
    assert(XlsxIngest.colIndex("AA10") == 26)
    assert(XlsxIngest.colIndex("AB1") == 27)
  }

  test("read parses shared/inline strings, numbers, booleans, sparse cells") {
    val dir = Files.createTempDirectory("xlsx")
    // row 2 leaves column B empty (sparse: C2 follows A2 directly)
    val sheet1 =
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3"><v>3.5</v></c><c r="B3" t="inlineStr"><is><t>inline text</t></is></c><c r="C3" t="b"><v>0</v></c></row>""".stripMargin
    writeXlsx(dir, "wb.xlsx", Seq(("Report", sheet1)),
      Seq("id", "label", "flag"))

    val df = XlsxIngest.read(spark, dir.resolve("wb.xlsx").toString)
    val rows = df.orderBy("row_idx").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "Report")
    assert(rows(0).getInt(2) == 0)
    assert(rows(0).getSeq[String](4) == Seq("id", "label", "flag"))
    assert(rows(1).getSeq[String](4) == Seq("42", null, "true"))
    assert(rows(2).getSeq[String](4) == Seq("3.5", "inline text", "false"))
  }

  test("read emits every sheet; readTable reads sheet 1 under the header") {
    val dir = Files.createTempDirectory("xlsx")
    val s1 =
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="s"><v>3</v></c></row>""".stripMargin
    // the Notes sheet has body rows too — readTable must NOT leak
    // them into the table (they'd positionally collide with sheet-1
    // columns); only the raw read sees them
    val s2 =
      """<row r="1"><c r="A1" t="s"><v>4</v></c></row>
        |<row r="2"><c r="A2"><v>999</v></c><c r="B2" t="s"><v>4</v></c></row>""".stripMargin
    writeXlsx(dir, "two.xlsx", Seq(("Main", s1), ("Notes", s2)),
      Seq("EmpId", "Name", "alice", "bob", "scratch"))

    val raw = XlsxIngest.read(spark, dir.resolve("two.xlsx").toString)
    assert(raw.select("sheet").distinct().count() == 2)

    val t = XlsxIngest.readTable(spark, dir.resolve("two.xlsx").toString,
      StructType(Seq(StructField("empid", LongType),
        StructField("name", StringType),
        StructField("missing_col", StringType))))
    val got = t.orderBy("empid").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((1L, "alice", null), (2L, "bob", null)))
  }

  test("excelSerialToTimestamp: epoch, 1900 leap bug, time fraction, null") {
    import spark.implicits._
    val got = Seq(Some(1.0), Some(59.0), Some(60.0), Some(61.0),
        Some(25569.0), Some(45000.5), None)
      .toDF("s")
      .select(XlsxIngest.excelSerialToTimestamp(col("s"))
        .cast("string").as("ts"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(
      Some("1900-01-01 00:00:00"), // serial 1 = the Excel epoch
      Some("1900-02-28 00:00:00"),
      Some("1900-03-01 00:00:00"), // the phantom 1900-02-29
      Some("1900-03-01 00:00:00"), // first post-bug serial
      Some("1970-01-01 00:00:00"), // unix epoch = serial 25569
      Some("2023-03-15 12:00:00"), // fraction .5 = noon
      None))
  }

  test("readTable round-trips a date column stored as Excel serials") {
    val dir = Files.createTempDirectory("xlsx")
    val sheet =
      """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>hired</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>45000.5</v></c></row>
        |<row r="3"><c r="A3"><v>2</v></c><c r="B3"><v>25569</v></c></row>""".stripMargin
    writeXlsx(dir, "dates.xlsx", Seq(("S", sheet)), Nil)
    val t = XlsxIngest.readTable(spark, dir.resolve("dates.xlsx").toString,
        StructType(Seq(StructField("id", LongType),
          StructField("hired", DoubleType))))
      .select(col("id"),
        XlsxIngest.excelSerialToTimestamp(col("hired"))
          .cast("string").as("hired_ts"))
    assert(t.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "2023-03-15 12:00:00"), (2L, "1970-01-01 00:00:00")))
  }

  test("header derives from each file's minimum row index, not hardcoded row 1") {
    val dir = Files.createTempDirectory("xlsx")
    // this workbook's sheet starts at row 3 (rows 1-2 absent) — the
    // old row_idx == 1 rule both failed the header require and, in a
    // multi-file read, leaked this file's header row in as data
    val late =
      """<row r="3"><c r="A3" t="inlineStr"><is><t>id</t></is></c><c r="B3" t="inlineStr"><is><t>dept</t></is></c></row>
        |<row r="4"><c r="A4"><v>7</v></c><c r="B4" t="inlineStr"><is><t>sec</t></is></c></row>""".stripMargin
    writeXlsx(dir, "late.xlsx", Seq(("S", late)), Nil)
    val one = XlsxIngest.readTable(spark, dir.resolve("late.xlsx").toString,
      StructType(Seq(StructField("id", LongType),
        StructField("dept", StringType))))
    assert(one.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "sec")))
    // mixed with a header-at-row-1 workbook: each file sheds its OWN
    // header row; no header text appears as data
    val normal =
      """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>dept</t></is></c></row>
        |<row r="2"><c r="A2"><v>8</v></c><c r="B2" t="inlineStr"><is><t>hr</t></is></c></row>""".stripMargin
    writeXlsx(dir, "a_normal.xlsx", Seq(("S", normal)), Nil)
    val both = XlsxIngest.readTable(spark, dir.toString + "/*.xlsx",
      StructType(Seq(StructField("id", LongType),
        StructField("dept", StringType))))
    assert(both.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "sec"), (8L, "hr")))
  }

  test("readTable unions multiple workbooks like the reference's per-file loop") {
    val dir = Files.createTempDirectory("xlsx")
    def sheet(rows: Seq[(Int, String)]) =
      ("""<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>dept</t></is></c></row>""" +
        rows.zipWithIndex.map { case ((id, d), i) =>
          s"""<row r="${i + 2}"><c r="A${i + 2}"><v>$id</v></c><c r="B${i + 2}" t="inlineStr"><is><t>$d</t></is></c></row>"""
        }.mkString)
    writeXlsx(dir, "a.xlsx", Seq(("S", sheet(Seq(1 -> "hr", 2 -> "eng")))), Nil)
    writeXlsx(dir, "b.xlsx", Seq(("S", sheet(Seq(3 -> "ops")))), Nil)

    val t = XlsxIngest.readTable(spark, dir.toString + "/*.xlsx",
      StructType(Seq(StructField("id", LongType),
        StructField("dept", StringType))))
    assert(t.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "hr"), (2L, "eng"), (3L, "ops")))
  }
}
