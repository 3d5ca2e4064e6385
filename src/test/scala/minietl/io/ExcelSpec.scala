package minietl.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExcelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("minietl-xlsx").toString

  test("column letters and refs round-trip") {
    assert(Excel.colLetters(0) === "A")
    assert(Excel.colLetters(25) === "Z")
    assert(Excel.colLetters(26) === "AA")
    assert(Excel.colLetters(27 * 26 - 1) === "ZZ")
    assert(Excel.refToCol("A1") === 0)
    assert(Excel.refToCol("Z9") === 25)
    assert(Excel.refToCol("AA12") === 26)
    assert(Excel.refToCol("BC3") === 54)
  }

  test("write/read round-trip preserves values and infers types") {
    val path = s"${tmp()}/t.xlsx"
    val df = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta <&> \"quoted\"", -2.25, false),
      (3L, null.asInstanceOf[String], 0.0, true)
    ).toDF("id", "name", "score", "flag")
    Excel.write(df, path)
    val back = Excel.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("id", "long"), ("name", "string"), ("score", "double"), ("flag", "boolean")))
    val rows = back.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(1).getString(1) === "beta <&> \"quoted\"")
    assert(rows(2).isNullAt(1))
    assert(rows(0).getDouble(2) === 1.5)
    assert(rows(1).getBoolean(3) === false)
  }

  test("serialToIso decodes the 1900 system with the phantom-leap-day quirk") {
    assert(Excel.serialToIso(45123.0) === "2023-07-16 00:00:00.000")
    assert(Excel.serialToIso(45123.5) === "2023-07-16 12:00:00.000")
    // first serial past the phantom 1900-02-29: decodes correctly
    assert(Excel.serialToIso(61.0) === "1900-03-01 00:00:00.000")
    // pre-1900-03-01 serials land one day late — the documented pandas/
    // openpyxl 1899-12-30-epoch convention (Excel calls serial 1 1900-01-01)
    assert(Excel.serialToIso(1.0) === "1899-12-31 00:00:00.000")
    // millisecond rounding absorbs binary-double serial noise
    assert(Excel.serialToIso(45123.9999999999) === "2023-07-17 00:00:00.000")
  }

  test("date-format detection ignores quoted literals and bracket sections") {
    assert(Excel.isDateFormatCode("yyyy-mm-dd"))
    assert(Excel.isDateFormatCode("[$-409]d-mmm-yy"))
    assert(Excel.isDateFormatCode("hh:mm:ss"))
    assert(Excel.isDateFormatCode("yyyy\\-mm\\-dd"))
    assert(!Excel.isDateFormatCode("#,##0.00"))
    assert(!Excel.isDateFormatCode("0.00E+00"))
    assert(!Excel.isDateFormatCode("[Red]0.0"))
    assert(!Excel.isDateFormatCode("\"yes\";\"no\"")) // quoted y/s don't count
  }

  test("date-styled numeric cells decode to timestamps on read") {
    // hand-built the way openpyxl/Excel lay it out: styles.xml maps cell
    // style 1 -> builtin date format 14 and style 2 -> a custom yyyy-mm-dd
    // code; date cells carry s="1"/"2" and plain serial numbers in <v>
    val dir = tmp()
    val path = s"$dir/dates.xlsx"
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      s"""<workbook xmlns="$ns" xmlns:r="$rns"><sheets>
         |<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    part("xl/styles.xml",
      s"""<styleSheet xmlns="$ns">
         |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/></numFmts>
         |<cellXfs count="3">
         |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
         |</cellXfs></styleSheet>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      s"""<worksheet xmlns="$ns"><sheetData>
         |<row r="1">
         |<c r="A1" t="inlineStr"><is><t>d1</t></is></c>
         |<c r="B1" t="inlineStr"><is><t>d2</t></is></c>
         |<c r="C1" t="inlineStr"><is><t>x</t></is></c>
         |</row>
         |<row r="2"><c r="A2" s="1"><v>45123</v></c>
         |<c r="B2" s="2"><v>45123.5</v></c><c r="C2"><v>7</v></c></row>
         |<row r="3"><c r="A3" s="1"><v>45124</v></c>
         |<c r="B3" s="2"><v>45200.25</v></c><c r="C3"><v>8</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val back = Excel.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("d1", "timestamp"), ("d2", "timestamp"), ("x", "long")))
    val rows = back.orderBy("x").collect()
    assert(rows(0).getTimestamp(0).toString.startsWith("2023-07-16 00:00:00"))
    assert(rows(0).getTimestamp(1).toString.startsWith("2023-07-16 12:00:00"))
    assert(rows(1).getTimestamp(0).toString.startsWith("2023-07-17 00:00:00"))
    assert(rows(1).getTimestamp(1).toString.startsWith("2023-10-01 06:00:00"))
    assert(rows(0).getLong(2) === 7L)
  }

  test("non-finite doubles round-trip as inline strings (valid XLSX)") {
    val path = s"${tmp()}/nan.xlsx"
    val df = Seq((1L, Double.NaN), (2L, Double.PositiveInfinity),
      (3L, Double.NegativeInfinity), (4L, 1.5)).toDF("id", "v")
    Excel.write(df, path)
    // no numeric <v>NaN</v> cells may exist (invalid per the XLSX spec)
    val zf = new java.util.zip.ZipFile(path)
    val sheetXml = try {
      val e = zf.getEntry("xl/worksheets/sheet1.xml")
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    } finally zf.close()
    assert(!sheetXml.contains("<v>NaN</v>"))
    assert(!sheetXml.contains("<v>Infinity</v>"))
    // and the reader re-infers the column as doubles, values intact
    val back = Excel.read(spark, path).orderBy("id")
      .as[(Long, Double)].collect()
    assert(back(0)._2.isNaN)
    assert(back(1)._2 === Double.PositiveInfinity)
    assert(back(2)._2 === Double.NegativeInfinity)
    assert(back(3)._2 === 1.5)
  }

  test("timestamps and decimals surface as strings (no serial-date encoding)") {
    val path = s"${tmp()}/ts.xlsx"
    val df = Seq((1L, "2024-03-01 10:30:00", BigDecimal("12.34")))
      .toDF("id", "ts_s", "amt")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    Excel.write(df, path)
    val back = Excel.read(spark, path)
    assert(back.schema("ts").dataType.typeName === "string")
    assert(back.head().getAs[String]("ts").startsWith("2024-03-01 10:30:00"))
    // decimal is textified, reads back as the exact decimal rendering
    assert(back.head().getAs[Double]("amt") === 12.34)
  }

  test("append mode unions with the existing sheet by column name") {
    val path = s"${tmp()}/a.xlsx"
    Excel.write(Seq((1L, "x")).toDF("id", "v"), path)
    Excel.write(Seq((2L, "y")).toDF("id", "v"), path, mode = "append")
    val back = Excel.read(spark, path).orderBy("id")
    assert(back.as[(Long, String)].collect().toSeq === Seq((1L, "x"), (2L, "y")))
  }

  test("sheet selection by wrong name or index fails with a clear message") {
    val path = s"${tmp()}/s.xlsx"
    Excel.write(Seq((1L, "x")).toDF("id", "v"), path, sheetName = "Data")
    assert(Excel.read(spark, path, name = Some("Data")).count() === 1)
    val e = intercept[IllegalArgumentException] {
      Excel.read(spark, path, name = Some("Nope"))
    }
    assert(e.getMessage.contains("no sheet 'Nope'"))
    intercept[IllegalArgumentException] { Excel.read(spark, path, index = 3) }
  }

  test("reads shared-strings files produced by other tools") {
    // hand-built minimal workbook the way openpyxl/Excel lay it out:
    // values in sharedStrings.xml, cells referencing them with t="s"
    val dir = tmp()
    val path = s"$dir/shared.xlsx"
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      s"""<workbook xmlns="$ns" xmlns:r="$rns"><sheets>
         |<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      s"""<sst xmlns="$ns" count="3" uniqueCount="3">
         |<si><t>k</t></si><si><t>hello</t></si><si><r><t>wor</t></r><r><t>ld</t></r></si></sst>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      s"""<worksheet xmlns="$ns"><sheetData>
         |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
         |<row r="2"><c r="A2" t="s"><v>1</v></c></row>
         |<row r="3"><c r="A3" t="s"><v>2</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq === Seq("k"))
    assert(back.as[String].collect().toSet === Set("hello", "world"))
  }

  test("excel source and sink run from YAML config") {
    val in = s"${tmp()}/in.xlsx"
    val out = s"${tmp()}/out.xlsx"
    Excel.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v"), in, sheetName = "Data")
    val yaml =
      s"""name: excel_roundtrip
         |source: {type: excel, filepath: $in, sheet_name: Data}
         |transformers:
         |  - type: filter
         |    condition: "k = 'a'"
         |sink: {type: excel, filepath: $out}
         |""".stripMargin
    import minietl.config.Config
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    val stats = Config.load(yaml).run(spark)
    assert(stats.rows === 2)
    assert(Excel.read(spark, out).count() === 2)
  }
}
