package graft.queries

import graft.QueryDef
import graft.etl.Pipeline

/** Flagship composite: the whole reference ETL (filter → compress →
  * candle → enrich) checked end-to-end against one oracle SQL that
  * replays every stage.
  */
object PipelineQueries {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "etl_pipeline",
      Some("""
        WITH ticks AS (
          SELECT user_id, ts, value FROM events WHERE value > 0
        ), sig AS (
          SELECT user_id, ts, value,
                 CAST(ts AS DATE) AS day,
                 lag(value) OVER w AS prev,
                 lag(CAST(ts AS DATE)) OVER w AS prev_day,
                 lead(CAST(ts AS DATE)) OVER w AS next_day
          FROM ticks
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), kept AS (
          SELECT user_id, ts, value, day FROM sig
          WHERE coalesce(abs(value - prev) / nullif(abs(prev), 0) > 0.001, false)
             OR prev IS NULL
             OR next_day IS NULL
             OR prev_day <> day
             OR next_day <> day
        ), candles AS (
          SELECT user_id, day,
                 min_by(value, ts) AS open,
                 max(value) AS high,
                 min(value) AS low,
                 max_by(value, ts) AS close,
                 COUNT(*) AS volume,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS turnover,
                 ROUND((min_by(value, ts) + max(value) + min(value) + max_by(value, ts)) / 4, 4) AS mean
          FROM kept
          GROUP BY user_id, day
        )
        SELECT ca.user_id, ca.day, c.c_name, c.c_mktsegment,
               ca.open, ca.high, ca.low, ca.close, ca.volume, ca.turnover, ca.mean
        FROM candles ca LEFT JOIN customer c ON ca.user_id = c.c_custkey
        ORDER BY ca.user_id, ca.day
      """.stripMargin.trim),
      (spark, dir) =>
        Pipeline.dailyCandlesEnriched(spark, dir).orderBy("user_id", "day")),

    // as-of join: every tick enriched with the close of the last COMPLETED
    // day for its key — composed single-window implementation vs DuckDB's
    // native ASOF JOIN as the oracle
    QueryDef(
      "asof_join_enrich",
      Some("""
        WITH cand AS (
          SELECT user_id, CAST(ts AS DATE) AS prev_day,
                 max_by(value, ts) AS prev_close,
                 CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS day_end
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT e.event_id, e.user_id, e.ts, e.value, c.prev_close, c.prev_day
        FROM events e ASOF LEFT JOIN cand c
          ON e.user_id = c.user_id AND e.ts >= c.day_end
        ORDER BY e.event_id
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.functions._
        val ev = graft.Tables.events(spark, dir).select("event_id", "user_id", "ts", "value")
        val candles = ev.groupBy(col("user_id"), to_date(col("ts")).as("prev_day"))
          .agg(max_by(col("value"), col("ts")).as("prev_close"))
          .withColumn("day_end",
            col("prev_day").cast("timestamp") + expr("INTERVAL 1 DAY"))
        graft.operators.AsOfJoin.asofLeftJoin(
          ev, candles,
          key = "user_id", leftTs = "ts", rightTs = "day_end",
          payloadCols = Seq("prev_close", "prev_day"))
          .select("event_id", "user_id", "ts", "value", "prev_close", "prev_day")
          .orderBy("event_id")
      }),

    // §3.2 dashboard chart flow: dimension point-lookup → candle range →
    // rolling Bollinger overlay (window 5, k=2) in one plan
    // (`dashboard/timescaledb_model.py:506-583` + `tabs/tab1.py:15-21`)
    QueryDef(
      "company_chart_data",
      Some("""
        WITH cid AS (
          SELECT c_custkey FROM customer WHERE c_name = 'Customer#000000007'
        ), candles AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 min_by(value, ts) AS open,
                 max(value) AS high,
                 min(value) AS low,
                 max_by(value, ts) AS close,
                 COUNT(*) AS volume
          FROM events
          WHERE user_id IN (SELECT c_custkey FROM cid)
          GROUP BY user_id, CAST(ts AS DATE)
        ), bb AS (
          SELECT *,
                 CASE WHEN COUNT(*) OVER w = 5 THEN AVG(close) OVER w END AS mid,
                 CASE WHEN COUNT(*) OVER w = 5 THEN STDDEV_SAMP(close) OVER w END AS sd
          FROM candles
          WINDOW w AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, day, open, high, low, close, volume,
               ROUND(mid, 4) AS bb_mid,
               ROUND(mid + 2 * sd, 4) AS bb_upper,
               ROUND(mid - 2 * sd, 4) AS bb_lower
        FROM bb
        ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.functions._
        val cid = graft.Tables.customer(spark, dir)
          .filter(col("c_name") === "Customer#000000007")
          .select(col("c_custkey"))
        val ticks = graft.Tables.events(spark, dir)
          .join(broadcast(cid), col("user_id") === col("c_custkey"), "left_semi")
        val candles = graft.etl.Candles
          .ohlcvDaily(ticks, "user_id", "ts", "value")
          .select("user_id", "day", "open", "high", "low", "close", "volume")
        graft.analytics.Indicators
          .bollinger(candles, key = "user_id", ts = "day", close = "close", n = 5, numStd = 2.0)
          .select(
            col("user_id"), col("day"), col("open"), col("high"), col("low"),
            col("close"), col("volume"),
            round(col("bb_mid"), 4).as("bb_mid"),
            round(col("bb_upper"), 4).as("bb_upper"),
            round(col("bb_lower"), 4).as("bb_lower"))
          .orderBy("user_id", "day")
      })
  )
}
