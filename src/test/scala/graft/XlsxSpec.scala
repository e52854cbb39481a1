package graft

import graft.io.{DictionaryIngest, Xlsx}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** XLSX ingestion (VERDICT r2 missing #2): 8 of the reference's staged
  * aux sources are .xlsx — minimal OOXML reader, zero new deps. */
class XlsxSpec extends SparkSpec {

  /** Write a minimal workbook exercising every cell encoding the
    * reference files use: shared strings, formula-str, inline numbers,
    * booleans, and gaps. */
  private def writeFixture(): String = {
    val path = Files.createTempFile("graft-xlsx", ".xlsx").toString
    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |  <sheet name="data" sheetId="1" r:id="rId1"/>
        |  <sheet name="dict" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |<si><t>nta_code</t></si><si><t>population</t></si><si><t>is_active</t></si>
        |<si><t>BX01</t></si><si><r><t>QN</t></r><r><t>55</t></r></si>
        |</sst>""".stripMargin)
    // row1: header (shared strings); row2: s + number + bool;
    // row3: rich-text shared string + formula-cached str + gap in C
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>12345</v></c><c r="C2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3" t="str"><f>SUM(1,2)</f><v>not_a_number</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>column_name</t></is></c><c r="B1" t="inlineStr"><is><t>type</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="inlineStr"><is><t>STRING</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>1</v></c><c r="B3" t="inlineStr"><is><t>INTEGER</t></is></c></row>
        |<row r="4"><c r="A4" t="s"><v>2</v></c><c r="B4" t="inlineStr"><is><t>boolean</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    path
  }

  test("xlsx: sheets, shared strings, formula-str, bools, gaps, rich text") {
    val path = writeFixture()
    assert(Xlsx.sheetNames(path) == Seq("data", "dict"))
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("BC7") == 54)

    val df = Xlsx.readSheetDF(spark, path, "data").cache()
    assert(df.columns.toSeq == Seq("nta_code", "population", "is_active"))
    val rows = df.orderBy("nta_code").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "BX01" && rows(0).getString(1) == "12345"
      && rows(0).getString(2) == "true")
    assert(rows(1).getString(0) == "QN55", "rich-text runs concatenate")
    assert(rows(1).getString(1) == "not_a_number", "formula keeps cached <v>")
    assert(rows(1).getString(2) == null, "missing cell -> NULL")
  }

  test("xlsx: dictionary sheet feeds the CSV staging contract + quarantine") {
    val path = writeFixture()
    val dict = Xlsx.readDictionarySheet(path, "dict", "column_name", "type")
    assert(dict == Seq(("nta_code", "STRING"), ("population", "INTEGER"),
      ("is_active", "boolean")))
    val schema = DictionaryIngest.schemaFromDictionary(dict)
    assert(schema("population").dataType == LongType)
    assert(schema("is_active").dataType == BooleanType)

    val typed = Xlsx.castWithDictionary(
      Xlsx.readSheetDF(spark, path, "data"), dict).cache()
    assert(typed.schema("population").dataType == LongType)
    val good = typed.filter(col("_corrupt_record").isNull).collect()
    assert(good.length == 1 && good.head.getLong(1) == 12345L
      && good.head.getBoolean(2))
    val bad = typed.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1, "uncastable population quarantined, not dropped")
    assert(bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
  }

  /** Second fixture: ref-less cells (writers may omit the r attribute),
    * phonetic <rPh> runs, and date serials. */
  private def writeEdgeFixture(): String = {
    val path = Files.createTempFile("graft-xlsx-edge", ".xlsx").toString
    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="edge" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    // si[0] carries a phonetic <rPh> run that must NOT reach cell text
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><r><t>Tokyo</t></r><rPh sb="0" eb="2"><t>TOUKYOU</t></rPh></si>
        |<si><t>name</t></si><si><t>d</t></si><si><t>ts</t></si>
        |</sst>""".stripMargin)
    // rows are entirely ref-less; row 2 has an EMPTY middle cell — the
    // value after it must still land in column 2, not shift left
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row><c t="s"><v>1</v></c><c t="s"><v>2</v></c><c t="s"><v>3</v></c></row>
        |<row><c t="s"><v>0</v></c><c/><c><v>45061.5</v></c></row>
        |<row><c t="str"><v>iso</v></c><c><v>45061</v></c><c t="str"><v>2023-05-15 12:00:00</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    path
  }

  test("xlsx: ref-less cells keep their column past gaps; rPh excluded; date serials cast") {
    val path = writeEdgeFixture()
    val df = Xlsx.readSheetDF(spark, path, "edge")
    assert(df.columns.toSeq == Seq("name", "d", "ts"))
    val rows = df.orderBy("name").collect()
    // phonetic run excluded: "Tokyo", not "TokyoTOUKYOU"
    assert(rows.map(_.getString(0)).toSeq == Seq("Tokyo", "iso"))
    // the empty ref-less middle cell did not shift 45061.5 into col d
    assert(rows(0).isNullAt(1) && rows(0).getString(2) == "45061.5")

    val typed = Xlsx.castWithDictionary(df,
      Seq(("name", "string"), ("d", "date"), ("ts", "datetime")))
      .orderBy("name").collect()
    assert(typed.forall(_.isNullAt(3)), "no quarantined rows")
    // serial 45061 = 1899-12-30 + 45061 days; .5 = noon (session UTC)
    val expectDate = java.time.LocalDate.of(1899, 12, 30).plusDays(45061)
    assert(typed(1).getDate(1).toLocalDate == expectDate)
    assert(typed(0).getTimestamp(2).toInstant.getEpochSecond ==
      math.round((45061.5 - 25569.0) * 86400))
    // ISO strings still take the direct-cast path
    assert(typed(1).getTimestamp(2).toString.startsWith("2023-05-15 12:00:00"))
  }

  test("xlsx: reads the reference's real staged workbooks") {
    val real = "/root/reference/ref/xlsx_nyc_econ_data_by_nta.xlsx"
    assume(new java.io.File(real).exists())
    val names = Xlsx.sheetNames(real)
    assert(names.contains("final_data") &&
      names.contains("final_cols_w_description"))
    // the workbook's own dictionary sheet: Column/format headers
    val dict = Xlsx.readDictionarySheet(real, "final_cols_w_description",
      "Column", "format")
    assert(dict.take(2) == Seq(("GeoType", "STRING"), ("NTAType", "INTEGER")))
    val schema = DictionaryIngest.schemaFromDictionary(dict)
    assert(schema("GeoType").dataType == StringType)
    assert(schema("NTAType").dataType == LongType)

    val df = Xlsx.readSheetDF(spark, real, "final_data")
    assert(df.columns.take(2).toSeq == Seq("GeoType", "NTAType"))
    assert(df.count() > 100, "real NTA economic rows read")
  }
}
