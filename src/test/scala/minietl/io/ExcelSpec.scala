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
