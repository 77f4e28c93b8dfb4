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
