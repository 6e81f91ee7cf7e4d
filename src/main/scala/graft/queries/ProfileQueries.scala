package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Dataset-profiling operators a training-data pipeline runs before
  * ingestion: hierarchy rollups, per-column null/min/max/distinct
  * profiles, exact quantiles.
  */
object ProfileQueries {

  val entries: Seq[QueryDef] = Seq(
    // ROLLUP hierarchy: (year, month) → year subtotals → grand total in
    // one pass (Spark expands grouping sets; partial agg still applies)
    QueryDef(
      "rollup_orders",
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), CAST(month(o_orderdate) AS BIGINT))
        ORDER BY y NULLS FIRST, m NULLS FIRST
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.orders(spark, dir)
          .rollup(
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .orderBy(col("y").asc_nulls_first, col("m").asc_nulls_first)
      }),

    // per-column profile of lineitem in ONE aggregation pass
    QueryDef(
      "data_profile",
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(l_orderkey) AS orderkey_nonnull,
               COUNT(DISTINCT l_orderkey) AS orderkey_distinct,
               min(l_quantity) AS qty_min,
               max(l_quantity) AS qty_max,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents_sum,
               min(l_shipdate) AS shipdate_min,
               max(l_shipdate) AS shipdate_max,
               COUNT(DISTINCT l_returnflag) AS returnflag_card
        FROM lineitem
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.lineitem(spark, dir).agg(
          count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("orderkey_nonnull"),
          countDistinct(col("l_orderkey")).as("orderkey_distinct"),
          min(col("l_quantity")).as("qty_min"),
          max(col("l_quantity")).as("qty_max"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents_sum"),
          min(col("l_shipdate")).as("shipdate_min"),
          max(col("l_shipdate")).as("shipdate_max"),
          countDistinct(col("l_returnflag")).as("returnflag_card"))
      }),

    // exact interpolated quantiles per group: both engines sort the group
    // and apply the same linear interpolation — identical doubles
    QueryDef(
      "value_quantiles",
      Some("""
        SELECT event_type,
               COUNT(*) AS n,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.9)").as("p90"),
            expr("percentile(value, 0.99)").as("p99"))
          .orderBy("event_type")
      })
  )
}
