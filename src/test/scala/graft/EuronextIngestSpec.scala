package graft

import graft.etl.EuronextIngest
import java.nio.file.Files

/** End-to-end Euronext source path with the reference's dirty shapes
  * (FIXTURES.md §1.2): junk characters in prices, non-digits in volumes,
  * SRD names, free-text markets, date from file name, ragged rows.
  */
class EuronextIngestSpec extends SparkSpec {
  import spark.implicits._

  test("euronext directory ingest: canonical schema, cleaned values, junk dropped") {
    val dir = Files.createTempDirectory("graft-euronext")
    Files.writeString(dir.resolve("Euronext_Equities_2024-03-05.csv"),
      "Symbol\tName\tLast\tVolume\tISIN\tMarket\n" +
        "ABC\tSRDAlpha Corp\t€1234,56\t12 345\tFR0000000001\tEuronext PARIS\n" +
        "DEF\tDelta\t77,5\t900\tNL0000000002\tEuronext Amsterdam\n" +
        "BAD\tZero Vol\t10,0\t0\tFR0000000003\tEuronext PARIS\n" +
        "NEG\tJunk Price\tabc\t10\tFR0000000004\tEuronext PARIS\n")
    val out = EuronextIngest.ingest(spark, dir.toString)
      .orderBy("symbol")
      .collect()
    assert(out.length == 2) // zero-volume and unparseable-price rows dropped
    val abc = out(0)
    assert(abc.getAs[String]("name") == "Alpha Corp") // SRD stripped
    assert(abc.getAs[Double]("last") == 1234.56) // € stripped, comma → dot
    assert(abc.getAs[Double]("volume") == 12345.0)
    assert(abc.getAs[Int]("mid") == 6)
    assert(abc.getAs[java.sql.Date]("date").toString == "2024-03-05")
    val def_ = out(1)
    assert(def_.getAs[Double]("last") == 77.5)
    assert(def_.getAs[Int]("mid") == 5)
  }

  test("xlsx ingest (S3) produces the same canonical rows as the CSV path") {
    import graft.sources.Xlsx
    val rows = Seq(
      Seq("Symbol", "Name", "Last", "Volume", "ISIN", "Market"),
      Seq("ABC", "SRDAlpha Corp", "€1234,56", "12 345", "FR0000000001", "Euronext PARIS"),
      Seq("DEF", "Delta", "77,5", "900", "NL0000000002", "Euronext Amsterdam"),
      Seq("BAD", "Zero Vol", "10,0", "0", "FR0000000003", "Euronext PARIS"))
    val dir = Files.createTempDirectory("graft-euronext-xlsx")
    Files.write(dir.resolve("Euronext_Equities_2024-03-05.xlsx"),
      Xlsx.encodeMinimal(rows))
    val out = EuronextIngest.ingestXlsx(spark, dir.toString)
      .orderBy("symbol").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("name") == "Alpha Corp")
    assert(out(0).getAs[Double]("last") == 1234.56)
    assert(out(0).getAs[Double]("volume") == 12345.0)
    assert(out(0).getAs[Int]("mid") == 6)
    assert(out(0).getAs[java.sql.Date]("date").toString == "2024-03-05")
    assert(out(1).getAs[Double]("last") == 77.5)
  }

  test("xlsx decoder degrades gracefully on invalid input") {
    import graft.sources.Xlsx
    assert(Xlsx.decode("not a zip at all".getBytes("UTF-8")) == Seq.empty)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("unrelated.txt"))
    zos.write("x".getBytes); zos.closeEntry(); zos.close()
    assert(Xlsx.decode(bos.toByteArray) == Seq.empty) // zip without a worksheet
  }

  test("xlsx decoder: shared strings, skipped cells, numeric cells, missing header column") {
    import graft.sources.Xlsx
    // hand-built sheet exercising the cell types encodeMinimal doesn't emit:
    // shared strings (t="s"), raw numerics (no t attr), and a gap (no B2)
    val shared =
      """<?xml version="1.0"?><sst xmlns="x"><si><t>Sym</t></si><si><r><t>Va</t></r><r><t>l</t></r></si></sst>"""
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>X</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>Y</t></is></c><c r="B3"><v>12.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Seq("xl/sharedStrings.xml" -> shared, "xl/worksheets/sheet1.xml" -> sheet).foreach {
      case (n, c) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val decoded = Xlsx.decode(bos.toByteArray)
    assert(decoded == Seq(
      IndexedSeq("Sym", "Val"),      // shared strings, rich-text runs joined
      IndexedSeq("X"),               // short row: missing trailing cell
      IndexedSeq("Y", "12.5")))      // numeric cell as raw string
  }
}
