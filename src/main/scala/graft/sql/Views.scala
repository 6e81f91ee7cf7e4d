package graft.sql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc SQL surface (SURVEY.md §3.3, reference `dashboard/tabs/tab3.py:
  * 41-100`): the reference forwards arbitrary user SQL to Postgres; here
  * Spark SQL IS the engine — register the warehouse tables as views and
  * parse/optimize/execute through Catalyst.
  */
object Views {

  /** Run one ad-hoc SQL statement against the registered testdata views.
    * The SQL dialect accepted is Spark SQL's ANSI surface; the queries the
    * engine ships keep to the ANSI subset DuckDB also accepts, so the
    * oracle replays the identical text.
    */
  def adhoc(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sqlText)
  }
}
