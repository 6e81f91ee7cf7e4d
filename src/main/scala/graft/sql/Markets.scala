package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's static `markets` dimension — 10 literal rows seeded at
  * DDL time (`etl/timescaledb_model.py:16-27`): (id, name, alias,
  * boursorama prefix, euronext marker). Always the broadcast side of any
  * join; registered as a view for the SQL surface.
  */
object Markets {

  case class Market(id: Int, name: String, alias: String, boursorama: String, euronext: String)

  val rows: Seq[Market] = Seq(
    Market(1, "New York", "nyse", "", ""),
    Market(2, "London Stock Exchange", "lse", "1u", ""),
    Market(3, "Borsa Italiana", "milano", "1g", ""),
    Market(4, "Mercados Espanoles", "madrid", "FF55-", ""),
    Market(5, "Euronext Amsterdam", "amsterdam", "1rA", "ams"),
    Market(6, "Euronext Paris", "paris", "1rP", "par"),
    Market(7, "Deutsche Borse", "xetra", "1z", ""),
    Market(8, "Euronext Brussels", "bruxelle", "FF11_", "bru"),
    Market(9, "Euronext Lisbon", "lisbon", "", "lis"),
    Market(10, "International", "int", "", ""))

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  def register(spark: SparkSession): Unit =
    df(spark).createOrReplaceTempView("markets")
}
