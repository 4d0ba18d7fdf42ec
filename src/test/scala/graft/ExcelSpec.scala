package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{Excel, ExcelSource}

/** Native XLSX reading (S4). The fixture writer below emits a minimal
  * but spec-valid workbook; the shared-strings test mimics what Excel
  * itself writes (`t="s"` + sharedStrings.xml), which the writer's
  * inline-string form does not exercise. */
class ExcelSpec extends SparkSpec {

  /** Test-only minimal xlsx writer (inline strings + raw numbers). */
  private def writeXlsx(path: String, rows: Seq[Seq[Any]]): Unit = {
    def cellXml(r: Int, c: Int, v: Any): String = {
      val ref = s"${('A' + c).toChar}${r + 1}"
      v match {
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case s =>
          val esc = s.toString.replace("&", "&amp;").replace("<", "&lt;")
          s"""<c r="$ref" t="inlineStr"><is><t>$esc</t></is></c>"""
      }
    }
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        rows.zipWithIndex.map { case (r, i) =>
          s"""<row r="${i + 1}">""" +
            r.zipWithIndex.map { case (v, j) => cellXml(i, j, v) }.mkString +
            "</row>"
        }.mkString + "</sheetData></worksheet>"
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
  }

  private def tmpXlsx(rows: Seq[Seq[Any]]): String = {
    val f = Files.createTempFile("dict", ".xlsx")
    f.toFile.deleteOnExit()
    writeXlsx(f.toString, rows)
    f.toString
  }

  test("readSheet: inline strings, numbers, sparse cells") {
    val p = tmpXlsx(Seq(
      Seq("table", "column", "incremental"),
      Seq("t1", "c1", 1),
      Seq("t2", "c2", 0)))
    assert(Excel.readSheet(p) === Seq(
      Seq("table", "column", "incremental"),
      Seq("t1", "c1", "1"),
      Seq("t2", "c2", "0")))
  }

  test("readSheet: shared strings, as Excel itself writes them") {
    // hand-build the t="s" + sharedStrings.xml form
    val f = Files.createTempFile("shared", ".xlsx")
    f.toFile.deleteOnExit()
    val zos = new ZipOutputStream(new FileOutputStream(f.toString))
    def put(n: String, c: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>alpha</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row><row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c></row></sheetData></worksheet>""")
    zos.close()
    assert(Excel.readSheet(f.toString) ===
      Seq(Seq("name"), Seq("alpha", "42")))
  }

  test("ExcelSource: header row becomes the schema; rows pad to width") {
    val p = tmpXlsx(Seq(
      Seq("table_name", "column_name"),
      Seq("orders", "o_orderkey"),
      Seq("orders", "o_custkey")))
    val df = ExcelSource(p).read(spark)
    assert(df.columns.toSeq === Seq("table_name", "column_name"))
    assert(df.count() === 2)
    assert(df.filter(df("column_name") === "o_custkey").count() === 1)
  }

  test("a DOCTYPE-bearing worksheet is rejected (XXE hardening) — " +
    "legitimate spreadsheet XML never carries one") {
    val f = Files.createTempFile("xxe", ".xlsx")
    f.toFile.deleteOnExit()
    val zos = new ZipOutputStream(new FileOutputStream(f.toString))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(("""<?xml version="1.0"?>""" +
      """<!DOCTYPE worksheet [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>""" +
      """<worksheet><sheetData><row r="1">""" +
      """<c r="A1" t="inlineStr"><is><t>&xxe;</t></is></c>""" +
      """</row></sheetData></worksheet>""").getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val e = intercept[Exception](Excel.readSheet(f.toString))
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("doctype"),
      e.toString)
  }

  test("colIndex handles multi-letter columns") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA3") === 26)
    assert(Excel.colIndex("AB12") === 27)
  }
}
