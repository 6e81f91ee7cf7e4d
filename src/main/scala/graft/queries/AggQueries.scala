package graft.queries

import graft.{QueryDef, Tables}
import graft.analytics.Indicators
import org.apache.spark.sql.functions._

/** Aggregate / set / sort operator coverage (SURVEY.md §2.4 A5–A9,
  * §2.6 O1–O5, §2.7 U1/U3, §2.2 P5–P8).
  */
object AggQueries {

  val entries: Seq[QueryDef] = Seq(
    // schema-drift union: two "generations" of the same feed — an old
    // extract without `value`, a new one with it — unioned BY NAME with
    // null fill (`unionByName(allowMissingColumns)` ≡ DuckDB
    // `UNION ALL BY NAME`), then aggregated with null-aware counts. The
    // batch-query face of the warehouse's schema-evolution contract
    // (WarehouseSpec): a pipeline must keep reading across a column
    // addition without a backfill.
    QueryDef(
      "union_schema_drift",
      Some("""
        WITH unioned AS (
          SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0
          UNION ALL BY NAME
          SELECT event_id, event_type FROM events WHERE event_id % 2 = 1
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(value) AS BIGINT) AS n_with_value,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM unioned GROUP BY event_type ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val newGen = ev.filter(col("event_id") % 2 === 0)
          .select("event_id", "event_type", "value")
        val oldGen = ev.filter(col("event_id") % 2 === 1)
          .select("event_id", "event_type")
        graft.Tails.orderedSmall(
          newGen.unionByName(oldGen, allowMissingColumns = true)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n_rows"),
              count(col("value")).as("n_with_value"),
              sum(round(coalesce(col("value"), lit(0)) * 100).cast("long")).as("cents")),
          col("event_type"))
      }),

    // A5/A6: table stats — counts, distinct counts, min/max bounds
    // (`etl/etl.py:869-878`, `dashboard/timescaledb_model.py:492, 606-633`).
    QueryDef(
      "table_stats",
      Some("""
        SELECT COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT event_type) AS n_types,
               CAST(min(ts) AS DATE) AS min_day,
               CAST(max(ts) AS DATE) AS max_day
        FROM events
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir).agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          to_date(min(col("ts"))).as("min_day"),
          to_date(max(col("ts"))).as("max_day"))
      }),

    // A5 at 100 TB: approx_count_distinct (HLL) — the documented scale
    // alternative to exact COUNT(DISTINCT) (SURVEY.md §2.4 A5). The raw
    // HLL estimate is engine-specific and can never hash-match DuckDB, so
    // the contract is stated IN the result instead: exact counts plus
    // within-±5%-band booleans for the estimates (rsd=0.02, so the 5%
    // band is a ≥2.5σ margin; HLL++ is DETERMINISTIC for fixed input —
    // no flakiness, a real drift goes red). The oracle states the same
    // columns with the booleans literally true — rows+schema+hash green,
    // tolerance pinned by the driver instead of a spec-only bound.
    QueryDef(
      "table_stats_approx",
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types_exact,
               count(DISTINCT user_id) >= 0 AS users_within_5pct,
               count(DISTINCT event_type) >= 0 AS types_within_5pct
        FROM events
      """.stripMargin.trim),
      (spark, dir) => {
        def inBand(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
          approx.cast("double").between(exact * 0.95, exact * 1.05)
        Tables.events(spark, dir).agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users_exact"),
          countDistinct(col("event_type")).as("n_types_exact"),
          inBand(approx_count_distinct(col("user_id"), 0.02),
            countDistinct(col("user_id"))).as("users_within_5pct"),
          inBand(approx_count_distinct(col("event_type"), 0.02),
            countDistinct(col("event_type"))).as("types_within_5pct"))
      }),

    // A8: horizontal per-row mean/std over four numeric columns with
    // sample ddof=1 (`dashboard/tabs/tab2.py:123-124`), computed closed-form.
    QueryDef(
      "row_stats",
      Some("""
        WITH t AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 min_by(value, ts) AS open, max(value) AS high,
                 min(value) AS low, max_by(value, ts) AS close
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), m AS (
          SELECT *, (open + high + low + close) / 4 AS mu FROM t
        )
        SELECT user_id, day,
               ROUND(mu, 4) AS row_mean,
               ROUND(sqrt(((open-mu)*(open-mu) + (high-mu)*(high-mu)
                         + (low-mu)*(low-mu) + (close-mu)*(close-mu)) / 3), 4) AS row_std
        FROM m
        ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        val candles = graft.etl.Candles.ohlcvDaily(
          Tables.events(spark, dir), "user_id", "ts", "value")
        candles.select(
          col("user_id"), col("day"),
          round(Indicators.rowMean4(col("open"), col("high"), col("low"), col("close")), 4).as("row_mean"),
          round(Indicators.rowStd4(col("open"), col("high"), col("low"), col("close")), 4).as("row_std"))
          .orderBy("user_id", "day")
      }),

    // A9: histogram over a date part (`etl/etl.py:652-657`).
    QueryDef(
      "month_histogram",
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY y, m
        ORDER BY y, m
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.orders(spark, dir)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .orderBy("y", "m")
      }),

    // the TPC-H Q1 pricing summary (the canonical scan-heavy warehouse
    // aggregation): one pushed shipdate filter, one 4-group hash-agg with
    // full map-side partial aggregation — the shape that proves the whole
    // fact scan reduces to O(groups) shuffle bytes. Money sums in exact
    // integer cents (order-independent); the three averages round at 4.
    QueryDef(
      "pricing_summary_q1",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
               round(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100e0 / COUNT(*), 4) AS avg_qty,
               round(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100e0 / COUNT(*), 4) AS avg_price,
               round(CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100e0 / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") <= lit(java.time.LocalDateTime.parse("2000-09-02T00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
              .cast("long")).as("sum_disc_cents"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax")) * 100).cast("long")).as("sum_charge_cents"),
            // avgs from the exact cent sums (r14 whitelist conversion):
            // quantity/price/discount all live on a 0.01 grid, so the
            // integer sums are exact and the single trailing division
            // sees identical operands in both engines
            round(sum(round(col("l_quantity") * 100).cast("long")).cast("double")
              / 100.0 / count(lit(1)), 4).as("avg_qty"),
            round(sum(round(col("l_extendedprice") * 100).cast("long")).cast("double")
              / 100.0 / count(lit(1)), 4).as("avg_price"),
            round(sum(round(col("l_discount") * 100).cast("long")).cast("double")
              / 100.0 / count(lit(1)), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // U4 widening: explicit INTERSECT / EXCEPT (set semantics with
    // dedup), tagged into one result — Spark plans both as hash
    // left-semi/anti joins after a distinct, identical shape to the
    // anti-join formulation but through the set-operator surface
    QueryDef(
      "set_operations",
      Some("""
        WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
             f AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
             i AS (SELECT k FROM b INTERSECT SELECT k FROM f),
             e AS (SELECT k FROM b EXCEPT SELECT k FROM f)
        SELECT 'intersect' AS op, k FROM i
        UNION ALL
        SELECT 'except' AS op, k FROM e
        ORDER BY op, k
      """.stripMargin.trim),
      (spark, dir) => {
        val b = Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val f = Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        b.intersect(f).withColumn("op", lit("intersect"))
          .unionByName(b.except(f).withColumn("op", lit("except")))
          .select("op", "k")
          .orderBy("op", "k")
      }),

    // U1/U3: union-all of per-source batches then DISTINCT
    // (`etl/etl.py:306, 423` pd.concat; `dashboard/timescaledb_model.py:461`).
    QueryDef(
      "union_distinct",
      Some("""
        SELECT user_id, event_type FROM (
          SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, event_type FROM events WHERE value > 150
        ) t
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val a = ev.filter(col("event_type") === "purchase").select("user_id", "event_type")
        val b = ev.filter(col("value") > 150).select("user_id", "event_type")
        a.unionByName(b).distinct().orderBy("user_id", "event_type")
      }),

    // P5/P6: range-cleanup DELETE and conditional UPDATE rewritten as
    // filter + when/otherwise (`etl/etl.py:817, 820`).
    QueryDef(
      "range_cleanup",
      Some("""
        SELECT event_id, user_id, value,
               CASE WHEN value < 1 THEN 0.0 ELSE value END AS value_fixed
        FROM events
        WHERE value IS NOT NULL AND value > 0 AND value <= 100000
        ORDER BY event_id
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .filter(col("value").isNotNull && col("value") > 0 && col("value") <= 100000)
          .select(col("event_id"), col("user_id"), col("value"),
            when(col("value") < 1, lit(0.0)).otherwise(col("value")).as("value_fixed"))
          .orderBy("event_id")
      }),

    // P8/O3/O4: time-range predicate + order + limit
    // (`dashboard/timescaledb_model.py:530, 545`; partition-prunable at scale).
    QueryDef(
      "time_range_topk",
      Some("""
        SELECT event_id, ts, user_id, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        ORDER BY value DESC, event_id
        LIMIT 100
      """.stripMargin.trim),
      (spark, dir) => {
        // range filter on the raw nanos column → pushed to the parquet
        // scan (row-group skipping); see Tables.eventsInRange
        Tables.eventsInRange(spark, dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
          .select("event_id", "ts", "user_id", "value")
          .orderBy(col("value").desc, col("event_id"))
          .limit(100)
      }),

    // O5: pagination — order + limit/offset (`dashboard/tabs/tab2.py:155-157`).
    QueryDef(
      "limit_offset_page",
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_orderkey
        LIMIT 50 OFFSET 200
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
          .offset(200)
          .limit(50)
      }),

    // A7-scalar + M5: grouped max + arithmetic (`etl/etl.py:292-299`).
    QueryDef(
      "group_max_next_id",
      Some("""
        SELECT c_mktsegment, max(c_custkey) AS max_id, max(c_custkey) + 1 AS next_id,
               COUNT(*) AS n
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.customer(spark, dir)
          .groupBy(col("c_mktsegment"))
          .agg(
            max(col("c_custkey")).as("max_id"),
            (max(col("c_custkey")) + 1).as("next_id"),
            count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      })
  )
}
