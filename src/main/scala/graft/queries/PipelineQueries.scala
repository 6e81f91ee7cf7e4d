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
                 ROUND(SUM(value), 4) AS turnover,
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
        Pipeline.dailyCandlesEnriched(spark, dir).orderBy("user_id", "day"))
  )
}
