package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** S3: XLSX scan — the reference's `pd.read_excel` landing path
  * (`etl/etl.py:510-511`), same logical schema as the dirty-CSV exports.
  *
  * XLSX is a zip of XML parts, so the JDK alone decodes it (java.util.zip
  * + StAX): no new dependency, honoring the container's fixed dependency
  * set. The decoder handles the parts `pd.read_excel` needs for these
  * files — one worksheet of rows with shared strings, inline strings and
  * raw numeric/boolean cells; cell values surface as STRINGS (the dirty
  * CSV path's contract — downstream Normalize does the typed coercion).
  *
  * Scale shape: identical to `BinarySnapshots` — `binaryFile` rows stream
  * through an executor-side flatMap, one file per task, the driver never
  * touches payload bytes. XLSX files are per-day exports (small); the
  * parallelism unit is the file, which is exactly how the reference's
  * per-file loop behaves, minus the loop.
  */
object Xlsx {

  /** zip part name → bytes, for the parts the decoder reads */
  private def parts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml" || e.getName.startsWith("xl/worksheets/"))
        out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** `<si>` entries of sharedStrings.xml (rich-text runs concatenated) */
  private[sources] def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val rd = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(xml))
    val strings = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inT = false
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (rd.getLocalName == "t") inT = true
        case XMLStreamConstants.CHARACTERS =>
          if (inT) cur.append(rd.getText)
        case XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "t" => inT = false
            case "si" => strings += cur.result(); cur.clear()
            case _ =>
          }
        case _ =>
      }
    }
    strings.toIndexedSeq
  }

  /** "B7" → 0-based column index 1 */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Decode one workbook's first worksheet into rows of nullable string
    * cells (row 0 = header row, like `pd.read_excel`).
    */
  def decode(bytes: Array[Byte]): Seq[IndexedSeq[String]] = {
    val p = parts(bytes)
    val shared = p.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(IndexedSeq.empty)
    val sheetName = p.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption
      .getOrElse(return Seq.empty)
    val rd = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(p(sheetName)))
    val rows = mutable.ArrayBuffer.empty[IndexedSeq[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    var inV = false
    var inIs = false
    var inT = false
    val text = new StringBuilder
    def setCell(v: String): Unit = {
      while (row.size <= cellCol) row += null
      row(cellCol) = v
    }
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellCol = Option(rd.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(if (row == null) 0 else row.size)
              cellType = Option(rd.getAttributeValue(null, "t")).getOrElse("n")
            case "v" => inV = true; text.clear()
            case "is" => inIs = true
            case "t" => if (inIs) { inT = true; text.clear() }
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS =>
          if (inV || inT) text.append(rd.getText)
        case XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "row" => rows += row.toIndexedSeq; row = null
            case "v" =>
              inV = false
              setCell(if (cellType == "s") shared(text.result().toInt) else text.result())
            case "t" => if (inT) { inT = false; setCell(text.result()) }
            case "is" => inIs = false
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** Read a directory of .xlsx files into a DataFrame with the requested
    * columns, matched by HEADER NAME per file (row 0), missing columns
    * null — `pd.read_excel` + rename-map semantics. A `path` column
    * carries the source file for filename-derived dates (S5/F8).
    */
  def read(spark: SparkSession, dir: String, columns: Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cols = columns // stable local for the closure
    spark.read.format("binaryFile").load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val rows = decode(bytes)
        rows.headOption match {
          case None => Iterator.empty
          case Some(header) =>
            val at = header.zipWithIndex.filter(_._1 != null).toMap
            rows.iterator.drop(1).map { r =>
              (path, cols.map(c => at.get(c).filter(_ < r.size).map(r).orNull))
            }
        }
      }
      .select(col("_1").as("path") +:
        cols.zipWithIndex.map { case (c, i) => col("_2").getItem(i).as(c) }: _*)
  }

  /** Minimal writer for landing tests and the pre-convert helper: one
    * sheet, all cells inline strings. Produces a workbook this decoder
    * and `pd.read_excel` both accept.
    */
  def encodeMinimal(rows: Seq[Seq[String]]): Array[Byte] = {
    def ref(r: Int, c: Int): String = {
      var n = c + 1; var s = ""
      while (n > 0) { s = ('A' + (n - 1) % 26).toChar.toString + s; n = (n - 1) / 26 }
      s + (r + 1)
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.append(s"""<row r="${ri + 1}">""")
      r.zipWithIndex.foreach { case (v, ci) =>
        if (v != null)
          sheet.append(s"""<c r="${ref(ri, ci)}" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet.result())
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
