package graft.io

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.xml.{Elem, XML}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal XLSX source/sink — demo-parity for the reference's Excel
  * surface (`/root/reference/demos/streamlit_demo.py:94-115` multi-sheet
  * read with sheet selection; `:540-568` three-sheet export). The offline
  * jar set has no POI, so this speaks OOXML directly: a zip of XML parts,
  * parsed with the scala-xml that ships with Spark.
  *
  * Scale note: XLSX is a driver-side interchange format for small config/
  * bid tables (the reference's workbooks are 5-8 rows) — the reader
  * materializes locally then `createDataFrame`s; parquet/CSV/JSON via
  * `spark.read` remain the engine's bulk sources.
  */
object Xlsx {

  // ----------------------------------------------------------- reading

  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try workbookSheets(zip).map(_._1)
    finally zip.close()
  }

  /** (sheet name, worksheet part path) in workbook order. */
  private def workbookSheets(zip: ZipFile): Seq[(String, String)] = {
    val wb = XML.load(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
    val rels = XML.load(zip.getInputStream(zip.getEntry("xl/_rels/workbook.xml.rels")))
    val relMap: Map[String, String] = (rels \ "Relationship").map { r =>
      (r \@ "Id") -> (r \@ "Target")
    }.toMap
    (wb \ "sheets" \ "sheet").map { s =>
      val rid = s.attribute("http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
        .map(_.text).getOrElse("")
      val target = relMap.getOrElse(rid, "worksheets/sheet1.xml")
      val path = if (target.startsWith("/")) target.drop(1)
        else if (target.startsWith("xl/")) target else s"xl/$target"
      ((s \@ "name"), path)
    }
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    Option(zip.getEntry("xl/sharedStrings.xml")) match {
      case None => IndexedSeq.empty
      case Some(e) =>
        val xml = XML.load(zip.getInputStream(e))
        (xml \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
    }
  }

  /** "BC12" -> 0-based column index 54. */
  private[io] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  /** Raw cell grid of a sheet: rows of (columnIndex -> string value). */
  private def sheetCells(zip: ZipFile, partPath: String,
                         sst: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val xml = XML.load(zip.getInputStream(zip.getEntry(partPath)))
    (xml \ "sheetData" \ "row").map { row =>
      // c/@r is OPTIONAL in OOXML (absent = "next column"); streaming
      // writers omit it, so track the running column index
      var nextIdx = 0
      (row \ "c").flatMap { c =>
        val ref = c \@ "r"
        val idx = if (ref.nonEmpty) colIndex(ref) else nextIdx
        nextIdx = idx + 1
        val t = c \@ "t"
        val value: Option[String] = t match {
          case "s"         => (c \ "v").headOption.map(v => sst(v.text.trim.toInt))
          case "inlineStr" => Some((c \ "is" \\ "t").map(_.text).mkString)
          case "b"         => (c \ "v").headOption.map(v => if (v.text.trim == "1") "true" else "false")
          case _           => (c \ "v").headOption.map(_.text)
        }
        value.map(idx -> _)
      }.toMap
    }
  }

  /** Read one sheet into a DataFrame. First row = header; column types are
    * inferred (long if all integral, double if all numeric, else string),
    * mirroring pandas `read_excel` inference for the types the reference
    * uses (SURVEY.md §1.2). */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val sheets = workbookSheets(zip)
      val (_, part) = sheet match {
        case Some(name) => sheets.find(_._1 == name).getOrElse(
          throw new IllegalArgumentException(
            s"Sheet '$name' not found; available: ${sheets.map(_._1).mkString(", ")}"))
        case None => sheets.head
      }
      val cells = sheetCells(zip, part, sharedStrings(zip))
      if (cells.isEmpty) return spark.emptyDataFrame

      val headerRow = cells.head
      val nCols = (headerRow.keys ++ cells.flatMap(_.keys)).max + 1
      val header = (0 until nCols).map(i => headerRow.getOrElse(i, s"col$i"))
      val dataRows = cells.tail

      def colValues(i: Int): Seq[Option[String]] = dataRows.map(_.get(i))
      def isLongCol(vs: Seq[Option[String]]) =
        vs.flatten.nonEmpty && vs.flatten.forall(v => v.toLongOption.isDefined)
      def isDoubleCol(vs: Seq[Option[String]]) =
        vs.flatten.nonEmpty && vs.flatten.forall(v => v.toDoubleOption.isDefined)
      def isBoolCol(vs: Seq[Option[String]]) =
        vs.flatten.nonEmpty && vs.flatten.forall(v => v == "true" || v == "false")

      val fields = (0 until nCols).map { i =>
        val vs = colValues(i)
        val dt: DataType =
          if (isLongCol(vs)) LongType
          else if (isDoubleCol(vs)) DoubleType
          else if (isBoolCol(vs)) BooleanType
          else StringType
        StructField(header(i), dt, nullable = true)
      }
      val schema = StructType(fields)
      val rows = dataRows.map { r =>
        Row.fromSeq((0 until nCols).map { i =>
          r.get(i) match {
            case None => null
            case Some(v) => fields(i).dataType match {
              case LongType    => v.toLong
              case DoubleType  => v.toDouble
              case BooleanType => v.toBoolean
              case _           => v
            }
          }
        })
      }
      spark.createDataFrame(rows.asJava, schema)
    } finally zip.close()
  }

  // ----------------------------------------------------------- writing

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def sheetXml(df: DataFrame): String = {
    val schema = df.schema
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(ref: String, v: Any): Unit = v match {
      case null => ()
      case n: Byte    => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: Short   => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: Int     => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: Long    => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: Float   => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: Double  => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case n: java.math.BigDecimal => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
      case b: Boolean => sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
      case other =>
        sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>""")
    }
    sb.append("""<row r="1">""")
    schema.fieldNames.zipWithIndex.foreach { case (n, i) => cell(s"${colRef(i)}1", n) }
    sb.append("</row>")
    df.collect().zipWithIndex.foreach { case (row, ri) =>
      sb.append(s"""<row r="${ri + 2}">""")
      (0 until row.length).foreach { ci =>
        cell(s"${colRef(ci)}${ri + 2}", if (row.isNullAt(ci)) null else row.get(ci))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Hard XLSX format ceiling (rows per worksheet, header included). */
  private val MaxSheetRows = 1048576L

  /** Write sheets (name -> DataFrame, driver-collected) as an XLSX file —
    * the analogue of the reference's three-sheet ExcelWriter export.
    *
    * Driver-side collection is intrinsic to a single-file XLSX, so this is
    * a small-result demo/report sink by design; a frame over the format's
    * own 1,048,576-row sheet limit fails fast with a pointer to the
    * distributed writers instead of OOMing the driver mid-collect. */
  def write(path: String, sheets: Seq[(String, DataFrame)]): Unit = {
    sheets.foreach { case (name, df) =>
      // limit(n+1).count, not count(): bounds the check's work and short-
      // circuits the scan as soon as the sheet is provably over the line
      val overLimit = df.limit((MaxSheetRows).toInt).count() >= MaxSheetRows
      if (overLimit) {
        throw new IllegalArgumentException(
          s"sheet '$name' exceeds the XLSX per-sheet limit of $MaxSheetRows rows " +
            "(header included); XLSX is a driver-collected report sink — " +
            "write large frames with df.write.parquet(...) or df.write.csv(...) instead")
      }
    }
    val out = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      val n = sheets.size
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
          """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString +
          """</sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          sheets.zipWithIndex.map { case (_, i) =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
          }.mkString +
          """</Relationships>""")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
    } finally out.close()
  }
}
