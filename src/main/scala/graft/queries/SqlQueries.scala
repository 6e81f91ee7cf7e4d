package graft.queries

import graft.QueryDef
import graft.sql.Views

/** X4 ad-hoc SQL passthrough (SURVEY.md §3.3): the SAME SQL text is
  * executed by Spark SQL (engine) and DuckDB (oracle) — the strongest
  * possible check of the SQL frontend, since nothing is translated.
  */
object SqlQueries {

  private val adhocAgg =
    """SELECT o_orderpriority,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  private val adhocJoin =
    """SELECT n.n_name,
      |       COUNT(*) AS n_customers,
      |       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin

  // correlated subqueries: EXISTS / NOT EXISTS / scalar COUNT — Catalyst
  // decorrelates all three into semi/anti/aggregate joins (no per-row
  // re-execution, unlike the reference's Postgres which may nested-loop)
  private val adhocExists =
    """SELECT c.c_custkey, c.c_mktsegment,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c.c_custkey""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("sql_adhoc_agg", Some(adhocAgg),
      (spark, dir) => Views.adhoc(spark, dir, adhocAgg)),
    QueryDef("sql_adhoc_join", Some(adhocJoin),
      (spark, dir) => Views.adhoc(spark, dir, adhocJoin)),
    QueryDef("sql_adhoc_exists", Some(adhocExists),
      (spark, dir) => Views.adhoc(spark, dir, adhocExists))
  )
}
