package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.Candles
import org.apache.spark.sql.functions._

/** OHLCV candle queries over the `events` tick table — the reference's
  * core day-close aggregation (`etl/etl.py:342-370`) and the dashboard
  * daily resample (`dashboard/timescaledb_model.py:557-572`,
  * `dashboard/tabs/tab2.py:103-109`).
  */
object CandleQueries {

  /** ONE oracle text for the three independent daily-candle execution
    * paths (expressions, typed Aggregator, incremental merge) — shared so
    * a rounding tweak cannot silently leave them checking different
    * oracles. */
  private val dailyOracle = """
        SELECT user_id, CAST(ts AS DATE) AS day,
               min_by(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               max_by(value, ts) AS close,
               COUNT(*) AS volume,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS turnover,
               ROUND((min_by(value, ts) + max(value) + min(value) + max_by(value, ts)) / 4, 4) AS mean
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
        ORDER BY user_id, day
      """.stripMargin.trim

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "ohlcv_daily",
      Some(dailyOracle),
      (spark, dir) => {
        val candles = Candles.ohlcvDaily(Tables.events(spark, dir), "user_id", "ts", "value")
        candles
          .withColumn("mean", round(col("mean"), 4))
          .orderBy("user_id", "day")
      }),
    // the CONTINUOUS-AGGREGATE maintenance path, driver-hard: the engine
    // folds three disjoint tick chunks through the mergeable candle
    // state (candleState + mergeCandleStates — what an incremental
    // refresh runs when a new batch lands, history never rescanned),
    // and the result must hash-match the ORACLE'S one-shot batch
    // aggregation over all ticks. Incremental ≡ batch is the entire
    // correctness contract of a materialized rollup
    QueryDef(
      "candles_incremental",
      Some(dailyOracle),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val chunks = (0 to 2).map(i =>
          Candles.candleState(ev.filter(pmod(col("event_id"), lit(3)) === i),
            "user_id", "ts", "value"))
        val merged = chunks.reduce(Candles.mergeCandleStates(_, _, "user_id"))
        Candles.finishCandles(merged)
          .withColumn("mean", round(col("mean"), 4))
          .orderBy("user_id", "day")
      }),

    // same oracle as ohlcv_daily, computed through the typed single-pass
    // Aggregator instead of six aggregate expressions — two independent
    // execution paths checked against one oracle
    QueryDef(
      "ohlcv_typed",
      Some(dailyOracle),
      (spark, dir) => {
        graft.operators.OhlcAggregator.dailyCandles(
          Tables.events(spark, dir), "user_id", "ts", "value")
          .withColumn("mean", round(col("mean"), 4))
          .select("user_id", "day", "open", "high", "low", "close", "volume", "turnover", "mean")
          .orderBy("user_id", "day")
      }),

    // A4 re-aggregation to a coarser calendar: daily candles → weekly
    // candles (`dashboard/tabs/tab2.py:103-109` resample pattern);
    // open/close carried by min_by/max_by over the day within the week
    QueryDef(
      "weekly_candles",
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 min_by(value, ts) AS open, max(value) AS high,
                 min(value) AS low, max_by(value, ts) AS close,
                 COUNT(*) AS volume
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT user_id, CAST(date_trunc('week', day) AS DATE) AS week,
               min_by(open, day) AS open,
               max(high) AS high,
               min(low) AS low,
               max_by(close, day) AS close,
               CAST(SUM(volume) AS BIGINT) AS volume
        FROM daily
        GROUP BY user_id, CAST(date_trunc('week', day) AS DATE)
        ORDER BY user_id, week
      """.stripMargin.trim),
      (spark, dir) => {
        val daily = Candles.ohlcvDaily(Tables.events(spark, dir), "user_id", "ts", "value")
        daily
          .groupBy(col("user_id"), to_date(date_trunc("week", col("day"))).as("week"))
          .agg(
            min_by(col("open"), col("day")).as("open"),
            max(col("high")).as("high"),
            min(col("low")).as("low"),
            max_by(col("close"), col("day")).as("close"),
            sum(col("volume")).as("volume"))
          .orderBy("user_id", "week")
      }),

    // event sessionization: native session_window (30-min inactivity gap)
    // vs the classic gap-and-island SQL formulation as oracle. Both define
    // a session break as inter-event gap ≥ the timeout (session_window's
    // window end is exclusive).
    QueryDef(
      "sessionization",
      Some("""
        WITH t AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM t
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) AS last_ts,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(
            min(col("ts")).as("session_start"),
            max(col("ts")).as("last_ts"),
            count(lit(1)).as("n_events"),
            sum(round(col("value") * 100).cast("long")).as("value_cents"))
          .drop("sw")
          .orderBy("user_id", "session_start")
      }),

    QueryDef(
      "resample_daily",
      Some("""
        SELECT CAST(ts AS DATE) AS day,
               min_by(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               max_by(value, ts) AS close,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS mean_value,
               COUNT(*) AS volume
        FROM events
        GROUP BY CAST(ts AS DATE)
        ORDER BY day
      """.stripMargin.trim),
      (spark, dir) => {
        Candles.resampleDaily(Tables.events(spark, dir), "ts", "value")
          .orderBy("day")
      })
  )
}
