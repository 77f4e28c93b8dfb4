package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.io.{FileSource, FileSync, XlsxIngest}

/** Drives the reference's SharePoint watermark loop end-to-end against
  * a local FileSource: list → gate on last-modified vs the processed
  * log (Snapshot.newerThan underneath, bootstrap included) → fetch →
  * parse (xlsx payloads through XlsxIngest) → append the log →
  * re-run is a no-op. */
class FileSyncSpec extends GraftSuite {
  import spark.implicits._

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private def at(hours: Long) = t0.plusSeconds(hours * 3600)

  private def touch(dir: Path, name: String, ts: Instant,
                    body: String = "x"): Unit = {
    val f = dir.resolve(name)
    Files.writeString(f, body)
    Files.setLastModifiedTime(f, FileTime.from(ts))
  }

  private def emptyLog =
    Seq.empty[(String, java.sql.Timestamp)].toDF("name", "last_modified")

  test("bootstrap pulls everything; watermark gates the second run") {
    val dir = Files.createTempDirectory("sync")
    touch(dir, "a.csv", at(1), "id,v\n1,10\n")
    touch(dir, "b.csv", at(2), "id,v\n2,20\n")
    val src = new FileSource.Local(dir, suffix = ".csv")

    // first run: empty log → full folder (the NULL-watermark bootstrap)
    val pull1 = FileSync.fetchNew(spark, src, emptyLog)
    assert(pull1.select("name").as[String].collect().sorted
      .toSeq == Seq("a.csv", "b.csv"))

    // append the log; nothing new → second run is empty
    val log1 = FileSync.logEntries(pull1)
    assert(FileSync.fetchNew(spark, src, log1).isEmpty)

    // a newer drop arrives → only it passes the gate
    touch(dir, "c.csv", at(3), "id,v\n3,30\n")
    val pull2 = FileSync.fetchNew(spark, src, log1)
    assert(pull2.select("name").as[String].collect().toSeq == Seq("c.csv"))
    assert(new String(pull2.select("content")
      .as[Array[Byte]].head()).contains("3,30"))

    // equal-to-watermark files do NOT re-pull (strict >, as the
    // reference's gate)
    val log2 = log1.union(FileSync.logEntries(pull2))
    assert(FileSync.fetchNew(spark, src, log2).isEmpty)
  }

  test("fetched xlsx payloads parse through XlsxIngest on executors") {
    val dir = Files.createTempDirectory("sync")
    // a real xlsx container (inline strings), built like XlsxIngestSpec
    val z = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(dir.resolve("report.xlsx")))
    def put(e: String, b: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(e))
      z.write(b.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="a" xmlns:r="b"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships><Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>emp</t></is></c><c r="B1"><v>7</v></c></row></sheetData></worksheet>""")
    z.close()
    Files.setLastModifiedTime(dir.resolve("report.xlsx"), FileTime.from(at(1)))

    val src = new FileSource.Local(dir, suffix = ".xlsx")
    val pulled = FileSync.fetchNew(spark, src, emptyLog)
    // distributed parse of the fetched payloads: the same parser the
    // binaryFile reader uses, applied per row on executors
    val parsed = pulled.select("name", "content").as[(String, Array[Byte])]
      .flatMap { case (n, bytes) =>
        XlsxIngest.parseWorkbook(bytes).map {
          case (sheet, _, idx, cells) => (n, sheet, idx, cells)
        }
      }.toDF("name", "sheet", "row_idx", "cells")
    val row = parsed.head()
    assert(row.getString(1) == "S" && row.getLong(2) == 1L)
    assert(row.getSeq[String](3) == Seq("emp", "7"))
  }
}
