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

  val entries: Seq[QueryDef] = Seq(
    QueryDef("sql_adhoc_agg", Some(adhocAgg),
      (spark, dir) => Views.adhoc(spark, dir, adhocAgg)),
    QueryDef("sql_adhoc_join", Some(adhocJoin),
      (spark, dir) => Views.adhoc(spark, dir, adhocJoin))
  )
}
