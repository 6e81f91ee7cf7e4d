package graft

import graft.ingest.Normalize
import org.apache.spark.sql.functions._

/** Dirty-input fixtures replaying the reference's input shapes
  * (FIXTURES.md §1.1/§1.2).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("symbol prefixes strip to (bare, market id) per reference table") {
    val rows = Seq(
      ("1rPABC", "ABC", 6), ("1rAXYZ", "XYZ", 5), ("1uLON", "LON", 2),
      ("1gMIL", "MIL", 3), ("FF55-MAD", "MAD", 4), ("1zGER", "GER", 7),
      ("FF11_BRU", "BRU", 8), ("1bBRU2", "BRU2", 8), ("PLAIN", "PLAIN", 6))
    val df = rows.map(_._1).toDF("symbol")
      .select(
        col("symbol"),
        Normalize.bareSymbol(col("symbol")).as("bare"),
        Normalize.marketIdFromSymbol(col("symbol"), lit(6)).as("mid"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == rows)
  }

  test("SRD name prefix stripped, others kept") {
    val df = Seq("SRDTotal", "Total", "SR", "SRDSRD").toDF("name")
      .select(Normalize.stripSrd(col("name")))
    assert(df.as[String].collect().toSeq == Seq("Total", "Total", "SR", "SRD"))
  }

  test("boursorama dirty price: '(c)' markers, whitespace, decimal comma, coerce") {
    val df = Seq("1 234,56 (c)", "12.5", "98,4(a)", "garbage", "7").toDF("last")
      .select(Normalize.cleanPriceBoursorama(col("last")))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(1234.56), Some(12.5), Some(98.4), None, Some(7.0)))
  }

  test("euronext price/volume cleanup with null→0 volume") {
    val p = Seq("€1.234,56", "abc", null).toDF("last")
      .select(Normalize.cleanPriceEuronext(col("last"))).collect().map(r => Option(r.get(0)))
    // [^0-9.,] strips '€'; '1.234,56' → '1.234.56' is unparseable → null
    // (matches pandas to_numeric(errors='coerce') on the same string)
    assert(p(1).isEmpty)
    val v = Seq("12 345 u", null, "x").toDF("volume")
      .select(Normalize.cleanVolumeEuronext(col("volume"))).collect().map(_.getDouble(0))
    assert(v.toSeq == Seq(12345.0, 0.0, 0.0))
  }

  test("free-text market mapping, case-insensitive, default Paris") {
    val df = Seq("Euronext PARIS", "Brussels market", "XETRA platform", "unknown")
      .toDF("market").select(Normalize.marketIdFromText(col("market")))
    assert(df.as[Int].collect().toSeq == Seq(6, 8, 7, 6))
  }

  test("filename date + underscore-time timestamp extraction") {
    val df = Seq("amsterdam 2023-04-05 09_02_30.bz2").toDF("f")
      .select(
        Normalize.fileDate(col("f")).cast("string"),
        Normalize.fileTimestamp(col("f")).cast("string"))
    val r = df.collect()(0)
    assert(r.getString(0) == "2023-04-05")
    assert(r.getString(1) == "2023-04-05 09:02:30")
  }
}
