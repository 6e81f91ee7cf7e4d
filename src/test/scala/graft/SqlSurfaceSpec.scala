package graft

import graft.sql.{Markets, Views}
import org.apache.spark.sql.functions._

/** S7/X4 writable SQL surface: DDL (CREATE TABLE), DML (INSERT), and the
  * static markets dimension, all through `spark.sql`.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("markets literal dimension joins against prefix-normalized symbols") {
    Markets.register(spark)
    val syms = Seq("1rPAAA", "1zBBB", "FF55-CCC", "PLAIN").toDF("symbol")
    syms.createOrReplaceTempView("raw_syms")
    val out = spark.sql("""
      SELECT s.symbol, m.alias
      FROM raw_syms s LEFT JOIN markets m
        ON m.boursorama <> '' AND s.symbol LIKE m.boursorama || '%'
      ORDER BY s.symbol
    """).collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("1rPAAA").contains("paris"))
    assert(out("1zBBB").contains("xetra"))
    assert(out("FF55-CCC").contains("madrid"))
    assert(out("PLAIN").isEmpty)
  }

  test("DDL + DML passthrough: CREATE TABLE, INSERT INTO, query back") {
    val loc = java.nio.file.Files.createTempDirectory("graft-ddl").resolve("daystocks")
    spark.sql(s"""
      CREATE TABLE graft_daystocks (day DATE, cid BIGINT, close DOUBLE)
      USING PARQUET LOCATION '${loc.toString}'
    """)
    try {
      spark.sql("INSERT INTO graft_daystocks VALUES (DATE'2024-01-01', 1, 10.5), (DATE'2024-01-02', 1, 11.0)")
      spark.sql("INSERT INTO graft_daystocks SELECT day, cid, close FROM graft_daystocks WHERE close > 10.6")
      val n = spark.sql("SELECT COUNT(*) FROM graft_daystocks").as[Long].head()
      assert(n == 3)
      val maxClose = spark.sql("SELECT max(close) FROM graft_daystocks").as[Double].head()
      assert(maxClose == 11.0)
    } finally spark.sql("DROP TABLE graft_daystocks")
  }

  test("ad-hoc surface rejects nothing the engine supports: aggregate over view") {
    val out = Views.adhoc(spark, sf,
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 0")
    assert(out.as[Long].head() > 0)
  }
}
