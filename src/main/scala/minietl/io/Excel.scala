package minietl.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Dependency-free XLSX source/sink — ExcelExtractor
  * (reference mini_etl/components/extractors.py:151-220) and ExcelLoader
  * (components/loaders.py:381-450), previously the one declared non-goal
  * among the reference's sources/sinks (no POI/openpyxl offline). XLSX is
  * a zip of XML parts, and the JDK ships both `java.util.zip` and an XML
  * stack, so a spec-subset implementation needs no third-party jar at all.
  *
  * Subset contract:
  *  - one workbook, sheets addressed by name or zero-based index
  *    (extractors.py:170 `sheet_name: Union[str, int] = 0`);
  *  - cells: numbers, booleans, inline strings (what we write) AND shared
  *    strings + cached formula strings (what openpyxl/Excel write), so
  *    files from real tools read back; styles/formats are ignored;
  *  - Excel serial DATES are not decoded — they surface as their serial
  *    numbers (documented; write-side converts timestamps to ISO strings
  *    so OUR round-trip is lossless-as-text);
  *  - the whole sheet is buffered on the DRIVER, exactly like the
  *    reference, whose loader concatenates every chunk in memory
  *    (loaders.py:421-431 "Excel doesn't support streaming writes well").
  *    This is a small-file interchange format, not a distributed scan —
  *    the 100 TB path is parquet/orc; validation caps nothing, but the
  *    scaladoc bound is the contract.
  *
  * Column types on read are inferred CSV-style per column: all-long →
  * long, else all-double → double, else all-boolean → boolean, else
  * string; the header row supplies column names (missing header cells
  * become _c{i}).
  */
object Excel {

  private val SheetNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  // ---------------------------------------------------------------- write

  /** Write `df` as a single-sheet .xlsx. `mode` `overwrite` replaces the
    * file; `append` reads the existing sheet (if any) and unions by column
    * name first — the reference's `mode='a'` concat (loaders.py:434-441).
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
            mode: String = "overwrite"): Unit = {
    require(mode == "overwrite" || mode == "append", s"excel mode: $mode")
    val spark = df.sparkSession
    val prepared = textSafe(df)
    val combined =
      if (mode == "append" && Files.exists(Paths.get(path)))
        textSafe(read(spark, path, Some(sheetName)))
          .unionByName(prepared, allowMissingColumns = true)
      else prepared
    val rows = combined.collect() // driver buffer — see scaladoc contract
    val schema = combined.schema
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def part(name: String, body: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      }
      part("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
           |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
           |</Types>""".stripMargin)
      part("_rels/.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
           |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="$SheetNs" xmlns:r="$RelNs">
           |<sheets><sheet name="${escape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
           |</Relationships>""".stripMargin)

      val sb = new StringBuilder
      sb ++= s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= s"""<worksheet xmlns="$SheetNs"><sheetData>"""
      def cellXml(ref: String, v: Any): String = v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
          s"""<c r="$ref"><v>$n</v></c>"""
        case s =>
          s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(s.toString)}</t></is></c>"""
      }
      sb ++= "<row r=\"1\">"
      schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
        sb ++= cellXml(s"${colLetters(i)}1", name)
      }
      sb ++= "</row>"
      rows.zipWithIndex.foreach { case (row, ri) =>
        sb ++= s"""<row r="${ri + 2}">"""
        (0 until row.length).foreach { ci =>
          if (!row.isNullAt(ci))
            sb ++= cellXml(s"${colLetters(ci)}${ri + 2}", row.get(ci))
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      part("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }

  /** Timestamps/dates/decimals → strings so the numeric cell path only
    * carries true binary-safe doubles/longs (Excel serial-date encoding is
    * deliberately not produced).
    */
  private def textSafe(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType if f.dataType.isInstanceOf[DecimalType] =>
          col(f.name).cast("string").as(f.name)
        case _: NumericType | BooleanType | StringType => col(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  // ----------------------------------------------------------------- read

  /** Read one sheet of an .xlsx into a DataFrame (header row = column
    * names, CSV-style type inference). Select the sheet by `name`, else by
    * zero-based `index` — the reference's `sheet_name` accepting either
    * (extractors.py:170).
    */
  def read(spark: SparkSession, path: String, name: Option[String] = None,
           index: Int = 0): DataFrame = {
    require(Files.exists(Paths.get(path)), s"Excel file not found: $path")
    val zf = new ZipFile(path)
    try {
      def entryXml(entryName: String): Option[scala.xml.Elem] =
        Option(zf.getEntry(entryName)).map(e => scala.xml.XML.load(zf.getInputStream(e)))
      val workbook = entryXml("xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/workbook.xml"))
      val rels = entryXml("xl/_rels/workbook.xml.rels")
        .map(r => (r \ "Relationship").map(n =>
          (n \@ "Id") -> (n \@ "Target")).toMap)
        .getOrElse(Map.empty)
      val sheets = (workbook \ "sheets" \ "sheet").map { s =>
        val rid = s.attributes.collectFirst {
          case a: scala.xml.PrefixedAttribute if a.key == "id" => a.value.text
        }.getOrElse("")
        (s \@ "name", rid)
      }
      require(sheets.nonEmpty, s"$path: workbook has no sheets")
      val (sheetName, rid) = name match {
        case Some(n) => sheets.find(_._1 == n)
          .getOrElse(throw new IllegalArgumentException(
            s"$path: no sheet '$n' (has ${sheets.map(_._1).mkString(", ")})"))
        case None =>
          require(index >= 0 && index < sheets.size,
            s"$path: sheet index $index out of range (${sheets.size} sheets)")
          sheets(index)
      }
      val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
      val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val sheet = entryXml(sheetPath)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing $sheetPath for '$sheetName'"))
      val shared: IndexedSeq[String] = entryXml("xl/sharedStrings.xml")
        .map(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)

      // sparse (rowIdx -> colIdx -> raw string value)
      val rawRows = (sheet \ "sheetData" \ "row").map { r =>
        val cells = mutable.Map.empty[Int, String]
        (r \ "c").zipWithIndex.foreach { case (c, pos) =>
          val ci = (c \@ "r") match {
            case "" => pos
            case ref => refToCol(ref)
          }
          val t = c \@ "t"
          val v: String = t match {
            case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
            case "s" =>
              val i = (c \ "v").text.trim.toInt
              if (i < shared.length) shared(i) else ""
            case "e" => null
            case "b" => if ((c \ "v").text.trim == "1") "true" else "false"
            case _ => (c \ "v").text // numbers and cached formula strings
          }
          if (v != null) cells(ci) = v
        }
        cells
      }
      require(rawRows.nonEmpty, s"$path: sheet '$sheetName' is empty")
      val width = rawRows.iterator.flatMap(_.keysIterator).max + 1
      val header = (0 until width).map(i => rawRows.head.getOrElse(i, s"_c$i"))
      val body = rawRows.tail.map(cells =>
        (0 until width).map(i => cells.get(i).orNull))

      def allParse(p: String => Boolean)(ci: Int): Boolean =
        body.forall { r => val v = r(ci); v == null || p(v) } &&
          body.exists(_(ci) != null)
      val types: IndexedSeq[DataType] = (0 until width).map { ci =>
        if (allParse(v => v.toLongOption.isDefined)(ci)) LongType
        else if (allParse(v => v.toDoubleOption.isDefined)(ci)) DoubleType
        else if (allParse(v => v == "true" || v == "false")(ci)) BooleanType
        else StringType
      }.toIndexedSeq
      val schema = StructType(header.zip(types).map { case (n, t) =>
        StructField(n, t, nullable = true) })
      val rows: Seq[Row] = body.map { r =>
        Row.fromSeq((0 until width).map { ci =>
          val v = r(ci)
          if (v == null) null else types(ci) match {
            case LongType => v.toLong
            case DoubleType => v.toDouble
            case BooleanType => v == "true"
            case _ => v
          }
        })
      }
      spark.createDataFrame(rows.asJava, schema)
    } finally zf.close()
  }

  // -------------------------------------------------------------- helpers

  /** 0 -> A, 25 -> Z, 26 -> AA ... */
  private[io] def colLetters(idx: Int): String = {
    var i = idx
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }

  /** "BC12" -> column index of "BC" (0-based). */
  private[io] def refToCol(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
}
