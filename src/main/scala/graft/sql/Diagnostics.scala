package graft.sql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog introspection for the ad-hoc SQL surface.
  *
  * The reference's diagnostics panel
  * (`dashboard/timescaledb_model.py:600`, `:638-644`) lists tables and
  * columns by querying `information_schema.tables` /
  * `information_schema.columns` with `table_schema='public'`. Spark's
  * session catalog exposes the same facts through `SHOW TABLES` /
  * `DESCRIBE TABLE` (both already work through [[Views.adhoc]] — they
  * are plain SQL to Catalyst), but a user pasting the reference's
  * Postgres SQL verbatim would get an unresolved-relation error.
  *
  * `registerInformationSchema` closes that: it materializes
  * `information_schema.tables` and `information_schema.columns` as
  * session-catalog views over the registered graft views, with the
  * Postgres-compatible column set (`table_schema` reported as 'public',
  * `ordinal_position` 1-based) — so the reference's diagnostics SQL runs
  * UNCHANGED. The views are literal-backed (a few hundred rows of
  * metadata), rebuilt on each call; this is introspection, not a data
  * path.
  */
object Diagnostics {

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Register `information_schema.tables` / `.columns` views describing
    * every graft view over `dir`. Idempotent; re-running refreshes.
    * `Tables.registerAll` calls [[buildInformationSchema]] automatically,
    * so any path through `Views.adhoc` serves the reference's diagnostics
    * SQL with no extra setup; this entrypoint remains for callers who
    * register their own view sets.
    */
  def registerInformationSchema(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir) // memoized; triggers buildInformationSchema
  }

  /** The view construction itself — called FROM Tables.registerAll, so it
    * must not call back into it (the memo guard is already held).
    *
    * Failure here must DEGRADE, not propagate: the views live in the
    * session catalog (`CREATE DATABASE` + `CREATE VIEW`), which needs a
    * writable warehouse/metastore. In a read-only or locked-down
    * deployment that DDL throws — and since `Tables.registerAll` calls
    * this on every ad-hoc path, an unguarded throw would take down ALL
    * `Views.adhoc` queries to buy an introspection nicety. Log and
    * continue: the data views still work; only the pasted
    * information_schema SQL loses its target (and says so in the log).
    */
  private[graft] def buildInformationSchema(spark: SparkSession, dir: String): Unit =
    try buildInformationSchemaOrThrow(spark, dir)
    catch {
      case e: Exception =>
        System.err.println(
          s"[graft] information_schema views unavailable (catalog not writable?): " +
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")} — " +
            "data views registered; diagnostics SQL against information_schema will not resolve")
    }

  private def buildInformationSchemaOrThrow(spark: SparkSession, dir: String): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    val tableRows = Tables.all.map { t =>
      s"(${sqlLit("spark_catalog")}, ${sqlLit("public")}, ${sqlLit(t)}, ${sqlLit("BASE TABLE")})"
    }
    spark.sql(
      s"""CREATE OR REPLACE VIEW information_schema.`tables`
         |  (table_catalog, table_schema, table_name, table_type) AS
         |VALUES ${tableRows.mkString(",\n       ")}""".stripMargin)
    val colRows = Tables.all.flatMap { t =>
      Tables.canonical(spark, dir, t).schema.fields.zipWithIndex.map { case (f, i) =>
        s"(${sqlLit("spark_catalog")}, ${sqlLit("public")}, ${sqlLit(t)}, " +
          s"${sqlLit(f.name)}, ${sqlLit(f.dataType.sql.toLowerCase)}, ${i + 1}, " +
          s"${sqlLit(if (f.nullable) "YES" else "NO")})"
      }
    }
    spark.sql(
      s"""CREATE OR REPLACE VIEW information_schema.`columns`
         |  (table_catalog, table_schema, table_name, column_name,
         |   data_type, ordinal_position, is_nullable) AS
         |VALUES ${colRows.mkString(",\n       ")}""".stripMargin)
  }

  /** The reference diagnostics panel as one call: table list, per-table
    * row counts, and the column schema — everything its
    * `run_diagnostics` prints, as a DataFrame instead of stdout.
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    registerInformationSchema(spark, dir)
    Tables.all.map { t =>
      Views.adhoc(spark, dir,
        s"SELECT ${sqlLit(t)} AS table_name, CAST(count(*) AS BIGINT) AS n_rows FROM `$t`")
    }.reduce(_ unionByName _).orderBy("table_name")
  }
}
