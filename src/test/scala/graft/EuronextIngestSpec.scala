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
}
