package graft.queries

import graft.QueryDef
import graft.sql.Views

/** X4 ad-hoc SQL passthrough (SURVEY.md §3.3): the SAME SQL text is
  * executed by Spark SQL (engine) and DuckDB (oracle) — the strongest
  * possible check of the SQL frontend, since nothing is translated.
  */
object SqlQueries {

  private val adhocWinnowSpark =
    s"""SELECT doc_id,
      |       CAST(size(fps) AS BIGINT) AS n_windows,
      |       aggregate(array_distinct(fps), CAST(0 AS BIGINT), (a, x) -> a + x) AS fp_checksum
      |FROM (
      |  SELECT doc_id,
      |         graft_winnow(regexp_replace(lower(trim(text)), '\\\\s+', ' '), 5, 4,
      |                      ${graft.textops.TextAnalysis.WinnowBase},
      |                      ${graft.textops.TextAnalysis.WinnowMod}) AS fps
      |  FROM documents
      |  WHERE length(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) >= 8
      |)
      |ORDER BY doc_id""".stripMargin

  private val adhocWinnowDuck =
    s"""WITH d AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, u.i AS i, ${graft.textops.TextAnalysis.hornerGramSqlDuck("t", "u.i", 5)} AS h
      |  FROM d, unnest(range(1, length(t) - 3)) AS u(i)
      |  WHERE length(t) >= 8
      |), win AS (
      |  SELECT doc_id, i,
      |         min(h) OVER (PARTITION BY doc_id ORDER BY i
      |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
      |         count(*) OVER (PARTITION BY doc_id) AS np
      |  FROM pos
      |), sel AS (
      |  SELECT doc_id, fp FROM win WHERE i <= np - 3
      |)
      |SELECT doc_id, COUNT(*) AS n_windows,
      |       CAST(SUM(DISTINCT fp) AS BIGINT) AS fp_checksum
      |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin

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

  // window functions through the raw-SQL surface: both engines execute
  // this text verbatim (named WINDOW clause, rank + lag + running sum)
  private val adhocWindow =
    """SELECT user_id, ts,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       lag(value) OVER w AS prev_value,
      |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER wrun AS BIGINT) AS run_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts),
      |       wrun AS (PARTITION BY user_id ORDER BY ts
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts""".stripMargin

  // LATERAL correlated subquery (top-2 orders per customer): Catalyst
  // plans DecorrelateInnerQuery + window, DuckDB a dependent join — the
  // per-group top-k idiom straight from user SQL
  private val adhocLateral =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice_cents
      |FROM customer c,
      |LATERAL (SELECT o_orderkey,
      |                CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
      |         FROM orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin

  // explicit GROUPING SETS (completes ROLLUP/CUBE): per-status,
  // per-priority, and grand-total groups in one pass
  private val adhocGroupingSets =
    """SELECT o_orderstatus, o_orderpriority,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // the LLM-operator surface from raw SQL: a user at the ad-hoc tab runs
  // similarity top-k with the engine's native `graft_dot` (codegen'd
  // int64 dot product, registered by GraftExtensions) over the
  // `embeddings` view. This text is Spark SQL; the oracle expresses the
  // identical exact-integer semantics in DuckDB list ops (graft_dot is
  // engine-native, so the same-text contract of the other sql_adhoc_*
  // entries can't apply). The BROADCAST hint pins the 8-row query batch
  // to the build side — the ANN-scoring plan shape PlanAuditSpec
  // sanctions (linear in the corpus).
  private val adhocSimilaritySpark =
    """WITH e AS (
      |  SELECT vec_id,
      |         transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, q, graft_dot(q, q) AS norm2 FROM e
      |), scored AS (
      |  SELECT /*+ BROADCAST(qs) */ qs.vec_id AS query_id, c.vec_id AS cand_id,
      |         CAST(graft_dot(qs.q, c.q) AS DOUBLE) /
      |           nullif(sqrt(CAST(qs.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE)), 0) AS cos
      |  FROM n c JOIN (SELECT * FROM n WHERE vec_id < 8) qs ON c.vec_id <> qs.vec_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rn
      |  FROM scored
      |)
      |SELECT query_id, cand_id, cos FROM ranked WHERE rn <= 5
      |ORDER BY query_id, rn""".stripMargin

  private val adhocSimilarityDuck =
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, q,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(q, v -> v * v)), (a, v) -> a + v) AS norm2
      |  FROM e
      |), scored AS (
      |  SELECT qs.vec_id AS query_id, c.vec_id AS cand_id,
      |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                list_transform(list_zip(qs.q, c.q), p -> p[1] * p[2])), (x, v) -> x + v) AS DOUBLE)
      |           / nullif(sqrt(CAST(qs.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE)), 0) AS cos
      |  FROM n c JOIN (SELECT * FROM n WHERE vec_id < 8) qs ON c.vec_id <> qs.vec_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rn
      |  FROM scored
      |)
      |SELECT query_id, cand_id, cos FROM ranked WHERE rn <= 5
      |ORDER BY query_id, rn""".stripMargin

  // recursive CTE (Spark 4's WITH RECURSIVE, same text in DuckDB): an
  // ancestor-chain walk over the implicit binary hierarchy node -> node/2
  // — the org-chart/BOM traversal shape, variable depth per leaf, pure
  // BIGINT output. Catalyst plans UnionLoop; depth here is ~log2(max
  // custkey), far under the recursion limit
  private val adhocRecursive =
    """WITH RECURSIVE anc(leaf, node, depth) AS (
      |  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT), CAST(0 AS BIGINT)
      |  FROM customer WHERE c_custkey % 97 = 0
      |  UNION ALL
      |  SELECT leaf, CAST(floor(node / 2) AS BIGINT), depth + 1
      |  FROM anc WHERE node > 1
      |)
      |SELECT leaf, CAST(max(depth) AS BIGINT) AS chain_len,
      |       CAST(sum(node) AS BIGINT) AS path_sum
      |FROM anc GROUP BY leaf ORDER BY leaf""".stripMargin

  // SQL PIVOT syntax through the Spark frontend (the reshape a
  // dashboard's ad-hoc tab writes by hand): explicit IN list so no
  // driver-side distinct pass, count + exact cent-sum per cell. DuckDB's
  // PIVOT is a different dialect, so the oracle states the equivalent
  // FILTER aggregates — the result contract (names, types, values) is
  // what the compare pins, like sql_adhoc_similarity.
  private val adhocPivotSpark =
    """SELECT c_mktsegment,
      |       CAST(coalesce(f_n, 0) AS BIGINT) AS f_n,
      |       CAST(coalesce(f_cents, 0) AS BIGINT) AS f_cents,
      |       CAST(coalesce(o_n, 0) AS BIGINT) AS o_n,
      |       CAST(coalesce(o_cents, 0) AS BIGINT) AS o_cents,
      |       CAST(coalesce(p_n, 0) AS BIGINT) AS p_n,
      |       CAST(coalesce(p_cents, 0) AS BIGINT) AS p_cents
      |FROM (
      |  SELECT c_mktsegment, o_orderstatus,
      |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |PIVOT (COUNT(*) AS n, SUM(cents) AS cents
      |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
      |ORDER BY c_mktsegment""".stripMargin

  private val adhocPivotDuck =
    """SELECT c_mktsegment,
      |       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
      |       CAST(COALESCE(SUM(cents) FILTER (o_orderstatus = 'F'), 0) AS BIGINT) AS f_cents,
      |       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
      |       CAST(COALESCE(SUM(cents) FILTER (o_orderstatus = 'O'), 0) AS BIGINT) AS o_cents,
      |       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
      |       CAST(COALESCE(SUM(cents) FILTER (o_orderstatus = 'P'), 0) AS BIGINT) AS p_cents
      |FROM (
      |  SELECT c_mktsegment, o_orderstatus,
      |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) t
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // SQL UNPIVOT syntax (PIVOT's inverse) through the Spark frontend;
  // DuckDB's UNPIVOT is again a different dialect, so the oracle states
  // the equivalent stacked UNION ALL. min/max are exact; the avg rounds
  // at 4 like every order-dependent float aggregate.
  private val adhocUnpivotSpark =
    """SELECT c_mktsegment, metric, v
      |FROM (
      |  SELECT c_mktsegment,
      |         round(avg(c_acctbal), 4) AS avg_bal,
      |         max(c_acctbal) AS max_bal,
      |         min(c_acctbal) AS min_bal
      |  FROM customer GROUP BY c_mktsegment
      |)
      |UNPIVOT (v FOR metric IN (avg_bal, max_bal, min_bal))
      |ORDER BY c_mktsegment, metric""".stripMargin

  private val adhocUnpivotDuck =
    """WITH w AS (
      |  SELECT c_mktsegment,
      |         round(avg(c_acctbal), 4) AS avg_bal,
      |         max(c_acctbal) AS max_bal,
      |         min(c_acctbal) AS min_bal
      |  FROM customer GROUP BY c_mktsegment
      |)
      |SELECT c_mktsegment, metric, v FROM (
      |  SELECT c_mktsegment, 'avg_bal' AS metric, avg_bal AS v FROM w
      |  UNION ALL SELECT c_mktsegment, 'max_bal', max_bal FROM w
      |  UNION ALL SELECT c_mktsegment, 'min_bal', min_bal FROM w
      |) t
      |ORDER BY c_mktsegment, metric""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("sql_adhoc_agg", Some(adhocAgg),
      (spark, dir) => Views.adhoc(spark, dir, adhocAgg)),
    QueryDef("sql_adhoc_join", Some(adhocJoin),
      (spark, dir) => Views.adhoc(spark, dir, adhocJoin)),
    QueryDef("sql_adhoc_exists", Some(adhocExists),
      (spark, dir) => Views.adhoc(spark, dir, adhocExists)),
    QueryDef("sql_adhoc_window", Some(adhocWindow),
      (spark, dir) => Views.adhoc(spark, dir, adhocWindow)),
    QueryDef("sql_adhoc_lateral", Some(adhocLateral),
      (spark, dir) => Views.adhoc(spark, dir, adhocLateral)),
    QueryDef("sql_adhoc_grouping_sets", Some(adhocGroupingSets),
      (spark, dir) => Views.adhoc(spark, dir, adhocGroupingSets)),
    QueryDef("sql_adhoc_similarity", Some(adhocSimilarityDuck),
      (spark, dir) => Views.adhoc(spark, dir, adhocSimilaritySpark)),
    QueryDef("sql_adhoc_recursive", Some(adhocRecursive),
      (spark, dir) => Views.adhoc(spark, dir, adhocRecursive)),
    QueryDef("sql_adhoc_pivot", Some(adhocPivotDuck),
      (spark, dir) => Views.adhoc(spark, dir, adhocPivotSpark)),
    // the O(n) winnowing kernel reached from RAW SQL (X5 from the X4
    // surface, like sql_adhoc_similarity for graft_dot): a tab3-style
    // user types graft_winnow and gets the no-shuffle plan; the oracle
    // states the per-position Horner + min-over-window equivalent
    QueryDef("sql_adhoc_winnow", Some(adhocWinnowDuck),
      (spark, dir) => Views.adhoc(spark, dir, adhocWinnowSpark)),
    QueryDef("sql_adhoc_unpivot", Some(adhocUnpivotDuck),
      (spark, dir) => Views.adhoc(spark, dir, adhocUnpivotSpark))
  )
}
