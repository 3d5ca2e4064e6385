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
  *  - Excel serial DATES are decoded on read: a numeric cell whose style
  *    resolves to a date/time number format (builtin ids or custom codes,
  *    via xl/styles.xml) is converted from its 1900-system serial to a
  *    session-timezone TIMESTAMP, matching `pd.read_excel` — including the
  *    1899-12-30-epoch handling of the phantom 1900-02-29 (see
  *    [[serialToIso]]); write-side still emits timestamps as ISO strings
  *    so OUR round-trip is lossless-as-text;
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
        // non-finite doubles are INVALID as numeric cells per the XLSX spec
        // (Excel/openpyxl reject <v>NaN</v>); emit as inline strings, which
        // read() re-infers as doubles (toDoubleOption accepts NaN/Infinity)
        case d: Double if d.isNaN || d.isInfinite =>
          s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>"""
        case f: Float if f.isNaN || f.isInfinite =>
          s"""<c r="$ref" t="inlineStr"><is><t>$f</t></is></c>"""
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
      // style indexes (cellXfs position) whose number format is a date/time
      // format — builtin ids 14-22/27-36/45-47/50-58 or a custom code with
      // date tokens; numeric cells styled with one carry serial dates
      val dateStyles: Set[Int] = entryXml("xl/styles.xml").map { st =>
        val custom = (st \ "numFmts" \ "numFmt").flatMap { n =>
          (n \@ "numFmtId").toIntOption.map(_ -> (n \@ "formatCode"))
        }.toMap
        def isDateFmt(id: Int): Boolean =
          (id >= 14 && id <= 22) || (id >= 27 && id <= 36) ||
            (id >= 45 && id <= 47) || (id >= 50 && id <= 58) ||
            custom.get(id).exists(isDateFormatCode)
        (st \ "cellXfs" \ "xf").zipWithIndex.collect {
          case (xf, i) if (xf \@ "numFmtId").toIntOption.exists(isDateFmt) => i
        }.toSet
      }.getOrElse(Set.empty)

      // sparse (rowIdx -> colIdx -> (raw string value, decoded-as-date))
      val rawRows = (sheet \ "sheetData" \ "row").map { r =>
        val cells = mutable.Map.empty[Int, (String, Boolean)]
        (r \ "c").zipWithIndex.foreach { case (c, pos) =>
          val ci = (c \@ "r") match {
            case "" => pos
            case ref => refToCol(ref)
          }
          val t = c \@ "t"
          val v: (String, Boolean) = t match {
            case "inlineStr" => ((c \ "is" \\ "t").map(_.text).mkString, false)
            case "s" =>
              val i = (c \ "v").text.trim.toInt
              (if (i < shared.length) shared(i) else "", false)
            case "e" => null
            case "b" => (if ((c \ "v").text.trim == "1") "true" else "false", false)
            case _ => // numbers and cached formula strings
              val raw = (c \ "v").text
              val dated = (c \@ "s").toIntOption.exists(dateStyles.contains) &&
                raw.trim.toDoubleOption.isDefined
              if (dated) (serialToIso(raw.trim.toDouble), true) else (raw, false)
          }
          if (v != null) cells(ci) = v
        }
        cells
      }
      require(rawRows.nonEmpty, s"$path: sheet '$sheetName' is empty")
      val width = rawRows.iterator.flatMap(_.keysIterator).max + 1
      val header = (0 until width).map(i => rawRows.head.get(i).map(_._1).getOrElse(s"_c$i"))
      val body = rawRows.tail.map(cells =>
        (0 until width).map(i => cells.get(i).orNull))

      def allParse(p: ((String, Boolean)) => Boolean)(ci: Int): Boolean =
        body.forall { r => val v = r(ci); v == null || p(v) } &&
          body.exists(_(ci) != null)
      val types: IndexedSeq[DataType] = (0 until width).map { ci =>
        if (allParse(_._2)(ci)) TimestampType
        else if (allParse(_._1.toLongOption.isDefined)(ci)) LongType
        else if (allParse(_._1.toDoubleOption.isDefined)(ci)) DoubleType
        else if (allParse(v => v._1 == "true" || v._1 == "false")(ci)) BooleanType
        else StringType
      }.toIndexedSeq
      // timestamp columns are built as STRINGS and cast in the Spark plan:
      // string→timestamp cast applies the SESSION timezone, so the decoded
      // wall-clock is session-consistent regardless of the JVM default zone
      // (a java.sql.Timestamp built driver-side would not be)
      val buildTypes = types.map { case TimestampType => StringType; case t => t }
      val schema = StructType(header.zip(buildTypes).map { case (n, t) =>
        StructField(n, t, nullable = true) })
      val rows: Seq[Row] = body.map { r =>
        Row.fromSeq((0 until width).map { ci =>
          val v = r(ci)
          if (v == null) null else buildTypes(ci) match {
            case LongType => v._1.toLong
            case DoubleType => v._1.toDouble
            case BooleanType => v._1 == "true"
            case _ => v._1
          }
        })
      }
      val df = spark.createDataFrame(rows.asJava, schema)
      if (types.contains(TimestampType))
        df.select(header.zip(types).zipWithIndex.map { case ((n, t), i) =>
          val c = col(df.columns(i))
          (if (t == TimestampType) c.cast(TimestampType) else c).as(n)
        }.toIndexedSeq: _*)
      else df
    } finally zf.close()
  }

  // -------------------------------------------------------------- helpers

  /** Excel 1900-system serial → wall-clock "yyyy-MM-dd HH:mm:ss.SSS".
    * Epoch 1899-12-30, the pandas/openpyxl convention: it compensates for
    * Excel's phantom 1900-02-29 so every serial >= 61 decodes correctly;
    * serials 1-59 (dates before 1900-03-01) land one day late — the
    * accepted 1900-leap-year quirk, reproduced deliberately for parity
    * with `pd.read_excel` (extractors.py:151-220). The sub-day fraction is
    * rounded to the millisecond (serials carry ~µs of binary-double noise).
    */
  private[io] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    val ms = math.round((serial - days) * 86400000.0)
    java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
      .plusDays(days).plusNanos(ms * 1000000L)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
  }

  /** Date-format heuristic over a custom number-format code: date/time
    * token letters (y m d h s) appearing OUTSIDE quoted literals,
    * [bracketed] sections, and backslash escapes make it a date format —
    * the same rule openpyxl's is_date_format applies.
    */
  private[io] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var inQuote = false; var inBracket = false; var esc = false
    code.foreach { ch =>
      if (esc) esc = false
      else if (inQuote) { if (ch == '"') inQuote = false }
      else if (inBracket) { if (ch == ']') inBracket = false }
      else ch match {
        case '"' => inQuote = true
        case '[' => inBracket = true
        case '\\' => esc = true
        case c => sb += c
      }
    }
    sb.exists(c => "ymdhsYMDHS".indexOf(c.toInt) >= 0)
  }

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
