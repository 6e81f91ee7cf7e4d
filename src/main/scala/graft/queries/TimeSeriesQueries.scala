package graft.queries

import graft.{QueryDef, Tables}
import graft.analytics.TimeSeries
import graft.operators.RangeJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series extensions beyond the reference (SURVEY.md has no range
  * join, gap-fill, EWMA or drawdown): bucketed interval-overlap join,
  * calendar gap-filling with forward-fill, bounded-window EWMA,
  * weighted daily average, running-peak drawdown — all over the `events`
  * tick table.
  */
object TimeSeriesQueries {

  val entries: Seq[QueryDef] = Seq(
    // interval-overlap (range) join: every event attributed to every
    // 3-hour "incident window" containing it. The oracle states the pure
    // inequality join; the Spark side MUST NOT plan that literally (BNLJ /
    // cartesian — PlanAuditSpec bans it) and instead runs the bucketed
    // rewrite in operators/RangeJoin: explode intervals into covered
    // hour-buckets, hash-join on the bucket, residual [start, end) filter
    QueryDef(
      "interval_join_bucketed",
      Some("""
        WITH iv AS (
          SELECT event_id AS incident_id, ts AS start_ts, ts + INTERVAL 3 HOUR AS end_ts
          FROM events WHERE event_id % 97 = 0
        )
        SELECT iv.incident_id, e.event_id, e.user_id, e.ts
        FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        ORDER BY incident_id, event_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val incidents = ev.filter(col("event_id") % 97 === 0)
          .select(
            col("event_id").as("incident_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 3 HOUR")).as("end_ts"))
        RangeJoin.pointInInterval(
            ev.select("event_id", "user_id", "ts"), "ts",
            incidents, "start_ts", "end_ts", bucketSeconds = 3600L)
          .select("incident_id", "event_id", "user_id", "ts")
          .orderBy("incident_id", "event_id")
      }),

    // the SAME range join written naively — the RangeJoinRewrite
    // optimizer rule (plans/RangeJoinRewrite, injected via
    // GraftExtensions) turns the inequality-only condition into the
    // bucketed equi-join automatically; PlanAuditSpec's no-cartesian
    // sweep passes over this entry BECAUSE the rule fires. Shares the
    // bucketed entry's oracle text
    QueryDef(
      "interval_join_rule",
      Some("""
        WITH iv AS (
          SELECT event_id AS incident_id, ts AS start_ts, ts + INTERVAL 3 HOUR AS end_ts
          FROM events WHERE event_id % 97 = 0
        )
        SELECT iv.incident_id, e.event_id, e.user_id, e.ts
        FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        ORDER BY incident_id, event_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
        val incidents = Tables.events(spark, dir).filter(col("event_id") % 97 === 0)
          .select(
            col("event_id").as("incident_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 3 HOUR")).as("end_ts"))
        ev.join(incidents,
            ev("ts") >= incidents("start_ts") && ev("ts") < incidents("end_ts"))
          .select("incident_id", "event_id", "user_id", "ts")
          .orderBy("incident_id", "event_id")
      }),

    // the AGGREGATE-FUSED form of the same range join: per-incident
    // count/avg/first/last, never materializing the match pairs. The two
    // pair-producing entries above are output-bound at scale (sf10: 4.29B
    // pairs emitted — SCALE.md tail table); a 100 TB deployment asking
    // "events per incident window" wants THIS shape, where the bucketed
    // join's matches stream straight into a same-stage partial hash agg
    // keyed by incident_id — what crosses the only post-join shuffle is
    // one partial row per (task, incident), O(#incidents), not O(#pairs).
    // The reference itself only ever aggregates matched ranges
    // (dashboard/timescaledb_model.py:557-572); the raw-pair forms stay
    // for the rarer attribution-listing use.
    QueryDef(
      "interval_join_agg",
      Some("""
        WITH iv AS (
          SELECT event_id AS incident_id, ts AS start_ts, ts + INTERVAL 3 HOUR AS end_ts
          FROM events WHERE event_id % 97 = 0
        )
        SELECT iv.incident_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(CAST(sum(CAST(round(e.value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / count(*), 4) AS avg_value,
               min(e.ts) AS first_ts,
               max(e.ts) AS last_ts
        FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        GROUP BY iv.incident_id
        ORDER BY incident_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val incidents = ev.filter(col("event_id") % 97 === 0)
          .select(
            col("event_id").as("incident_id"),
            col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 3 HOUR")).as("end_ts"))
        RangeJoin.pointInInterval(
            ev.select("ts", "value"), "ts",
            incidents, "start_ts", "end_ts", bucketSeconds = 3600L)
          .groupBy("incident_id")
          .agg(
            count(lit(1)).as("n_events"),
            // avg via an EXACT quantized BIGINT sum, one float division at
            // the end: a float avg over the largest match stream in the
            // catalog (42.9M pairs at sf1) is summation-order-dependent,
            // and round(.,4) amplifies a sub-ulp cross-engine diff into a
            // visible digit whenever a group's mean lands on a rounding
            // boundary (caught by the r12 sf1 sweep: 1 of 26k incidents).
            // Identical int operands → identical IEEE divisions → stable.
            round(sum(expr("cast(round(value * 10000) as bigint)"))
              .cast("double") / lit(10000.0) / count(lit(1)), 4).as("avg_value"),
            min(col("ts")).as("first_ts"),
            max(col("ts")).as("last_ts"))
          // incident_id is unique (one row per GROUP BY key) → total order
          .orderBy("incident_id")
      }),

    // calendar gap-fill + forward-fill: complete per-user daily spine,
    // missing days flagged and filled with the last prior close (LOCF).
    // `filled` is a carried RAW value (max_by of ticks), not a float
    // aggregate — exact in both engines, no rounding needed
    QueryDef(
      "gapfill_daily",
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, max_by(value, ts) AS close
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), bounds AS (
          SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY user_id
        ), spine AS (
          SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
          FROM bounds
        )
        SELECT s.user_id, s.day,
               d.close IS NULL AS is_gap,
               last_value(d.close IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        ORDER BY s.user_id, s.day
      """.stripMargin.trim),
      (spark, dir) => {
        TimeSeries.gapFillDaily(
            Tables.events(spark, dir).select("user_id", "ts", "value"),
            key = "user_id", ts = "ts", value = "value")
          .select("user_id", "day", "is_gap", "filled")
          .orderBy("user_id", "day")
      }),

    // calendar-spine linear interpolation — gapfill_daily's numeric
    // sibling: gap days get the straight line between the surrounding
    // anchors (nearest anchor at the edges). Arithmetic is stated
    // IDENTICALLY in both engines (integer day deltas, one multiply, one
    // divide) and rounded to 4 decimals per the determinism contract.
    QueryDef(
      "interpolate_linear",
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, max_by(value, ts) AS close
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), bounds AS (
          SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY user_id
        ), spine AS (
          SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
          FROM bounds
        ), j AS (
          SELECT s.user_id, s.day, d.close,
                 last_value(d.close IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
                 last_value(CASE WHEN d.close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
                 first_value(d.close IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
                 first_value(CASE WHEN d.close IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
          FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        )
        SELECT user_id, day, close IS NULL AS is_gap,
               round(CASE WHEN close IS NOT NULL THEN close
                          WHEN prev_v IS NULL THEN next_v
                          WHEN next_v IS NULL THEN prev_v
                          ELSE prev_v + (next_v - prev_v)
                                 * date_diff('day', prev_d, day)
                                 / date_diff('day', prev_d, next_d)
                     END, 4) AS interp
        FROM j ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        TimeSeries.interpolateDaily(
            Tables.events(spark, dir).select("user_id", "ts", "value"),
            key = "user_id", ts = "ts", value = "value")
          .select(col("user_id"), col("day"), col("is_gap"),
            round(col("interp"), 4).as("interp"))
          .orderBy("user_id", "day")
      }),

    // autocorrelation function at lags 1–3 over each user's daily-close
    // series — the seasonality/persistence diagnostic (a daily-periodic
    // signal shows acf spikes at its period). Pearson is stated as
    // EXPLICIT pairwise-filtered moments with a guarded post-agg
    // division rather than `corr(...)`: Spark 4's ANSI mode makes corr
    // THROW on a zero-variance group where DuckDB's corr returns NULL —
    // a latent crash on degenerate real-world series (found by
    // TimeSeriesSpec's constant-series case; the testdata never
    // triggers it). Identical formula both engines, round(4).
    QueryDef(
      "acf_lags",
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, max_by(value, ts) AS close
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), lagged AS (
          SELECT user_id, close,
                 lag(close, 1) OVER (PARTITION BY user_id ORDER BY day) AS l1,
                 lag(close, 2) OVER (PARTITION BY user_id ORDER BY day) AS l2,
                 lag(close, 3) OVER (PARTITION BY user_id ORDER BY day) AS l3
          FROM daily
        ), m AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
                 covar_samp(close, l1) AS c1,
                 stddev_samp(close) FILTER (WHERE l1 IS NOT NULL) AS s1a, stddev_samp(l1) AS s1b,
                 covar_samp(close, l2) AS c2,
                 stddev_samp(close) FILTER (WHERE l2 IS NOT NULL) AS s2a, stddev_samp(l2) AS s2b,
                 covar_samp(close, l3) AS c3,
                 stddev_samp(close) FILTER (WHERE l3 IS NOT NULL) AS s3a, stddev_samp(l3) AS s3b
          FROM lagged GROUP BY user_id
        )
        SELECT user_id, n_days,
               round(CASE WHEN s1a > 0 AND s1b > 0 THEN c1 / (s1a * s1b) END, 4) AS acf1,
               round(CASE WHEN s2a > 0 AND s2b > 0 THEN c2 / (s2a * s2b) END, 4) AS acf2,
               round(CASE WHEN s3a > 0 AND s3b > 0 THEN c3 / (s3a * s3b) END, 4) AS acf3
        FROM m ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        graft.Tails.orderedSmall(
          graft.analytics.TimeSeries.acfLags(
            Tables.events(spark, dir).select("user_id", "ts", "value"),
            key = "user_id", ts = "ts", value = "value"),
          col("user_id"))
      }),

    // hopping (sliding) windows — 10-minute width, 5-minute hop: the
    // overlapping-window aggregation Structured Streaming shares with
    // batch (`window(ts, width, hop)`). Each event lands in exactly
    // width/hop = 2 windows; the oracle states the same membership with
    // exact microsecond arithmetic. Value sums are exact integer cents
    QueryDef(
      "hopping_candles",
      Some("""
        WITH e AS (
          SELECT epoch_us(ts) AS se, CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ), m AS (
          SELECT u.s AS ws, se, cents
          FROM (SELECT se, cents, se - se % 300000000 AS g FROM e) t,
               unnest([g - 300000000, g]) AS u(s)
          WHERE se >= u.s AND se - u.s < 600000000
        )
        SELECT make_timestamp(ws) AS w_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM m
        GROUP BY ws
        ORDER BY w_start
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .select(window(col("ts"), "10 minutes", "5 minutes").as("w"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("w.start").as("w_start"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
          .orderBy("w_start")
      }),

    // bounded-window EWMA (adjust=true, α=0.3, 10-row window): weights
    // (1−α)^j oldest→newest folded in identical order in both engines,
    // rounded to 4 decimals per the determinism contract
    QueryDef(
      "ewma_smooth",
      Some("""
        SELECT user_id, ts, value,
               round(
                 list_sum(list_transform(lw, (x, i) -> x * pow(0.7, len(lw) - i))) /
                 list_sum(list_transform(lw, (x, i) -> pow(0.7, len(lw) - i))), 4) AS ewma
        FROM (
          SELECT user_id, ts, value,
                 list(value) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS lw
          FROM events) t
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        TimeSeries.ewma(
            Tables.events(spark, dir).select("user_id", "ts", "value"),
            key = "user_id", ts = "ts", value = "value", alpha = 0.3, window = 10)
          .select("user_id", "ts", "value", "ewma")
          .orderBy("user_id", "ts")
      }),

    // weighted daily average: value weighted by the JSON `k` prop —
    // integer cents × integer weights accumulate exactly, and the
    // average is emitted as an EXACT scaled integer (price × 10⁻⁴,
    // truncated toward zero — Spark DIV and DuckDB // agree on negative
    // operands too): vwap = Σcents·k / (100·Σk), so ×10⁴ = Σcents·k·100 // Σk.
    // A rounded double here is a genuine cross-engine hazard — the
    // rational lands exactly on a 5th-decimal midpoint for round-number
    // weight sums, and Spark (HALF_UP on BigDecimal) vs DuckDB
    // (half-away on scaled doubles) disagree on ties. Integer floor
    // division has no ties.
    QueryDef(
      "vwap_daily",
      Some("""
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(k) AS BIGINT) AS total_w,
               CAST(SUM(cents * k) * 100 // nullif(SUM(k), 0) AS BIGINT) AS vwap_e4
        FROM (
          SELECT user_id, ts,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events) t
        GROUP BY user_id, CAST(ts AS DATE)
        ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(spark, dir)
          .select(
            col("user_id"), col("ts"), k.as("k"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("k")).as("total_w"), sum(col("cents") * col("k")).as("_cw"))
          .withColumn("vwap_e4", expr("CAST((_cw * 100) DIV nullif(total_w, 0) AS BIGINT)"))
          .select("user_id", "day", "total_w", "vwap_e4")
          .orderBy("user_id", "day")
      }),

    // running peak + drawdown-from-peak: cumulative max carries a RAW
    // value (exact); the drawdown ratio is one division, rounded to 4
    QueryDef(
      "drawdown",
      Some("""
        SELECT user_id, ts, value,
               max(value) OVER w AS peak,
               round((max(value) OVER w - value) / nullif(max(value) OVER w, 0), 4) AS dd
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        TimeSeries.drawdown(
            Tables.events(spark, dir).select("user_id", "ts", "value"),
            key = "user_id", ts = "ts", value = "value")
          .select("user_id", "ts", "value", "peak", "dd")
          .orderBy("user_id", "ts")
      }),

    // classical additive seasonal decomposition of the daily volume
    // series: trend = centered 7-observation moving average (full
    // windows only), seasonal = mean detrended value per weekday,
    // residual = the rest. Pure window/group algebra — one sort by day,
    // one weekday re-agg — so it decomposes a 2000-day series or a
    // per-key panel identically (add the key to every PARTITION BY).
    // Weekday is Monday=0 in both engines (Spark weekday(), DuckDB
    // isodow-1).
    QueryDef(
      "seasonal_decompose",
      Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY day
        ), t AS (
          SELECT day, n,
                 SUM(CAST(n AS BIGINT)) OVER w AS sum7,
                 COUNT(*) OVER w AS wn
          FROM daily
          WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ), interior AS (
          SELECT day, n, sum7, CAST(isodow(day) - 1 AS BIGINT) AS dow,
                 CAST(7 * n - sum7 AS BIGINT) AS det_units
          FROM t WHERE wn = 7
        ), seas AS (
          SELECT dow,
                 CAST(SUM(CAST(det_units AS BIGINT)) AS DOUBLE) / 7.0 / COUNT(*) AS seasonal
          FROM interior GROUP BY dow
        )
        SELECT i.day, CAST(i.n AS BIGINT) AS n,
               CAST(i.sum7 AS DOUBLE) / 7.0 AS trend,
               s.seasonal AS seasonal,
               i.n - CAST(i.sum7 AS DOUBLE) / 7.0 - s.seasonal AS residual
        FROM interior i JOIN seas s ON i.dow = s.dow
        ORDER BY i.day
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(spark, dir)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        // EXACT fixed-point algebra on the integer counts: trend = sum7/7
        // and detrended·7 = 7n − sum7 is a pure integer, so the per-dow
        // seasonal mean is an integer sum divided twice by identical
        // operands — no float-summation drift anywhere (r13
        // whitelist-conversion; was round(4) over avg-of-k/7 values)
        val interior = daily
          .withColumn("sum7", sum(col("n")).over(w))
          .withColumn("wn", count(lit(1)).over(w))
          .filter(col("wn") === 7)
          .withColumn("dow", weekday(col("day")).cast("long"))
          .withColumn("det_units", lit(7L) * col("n") - col("sum7"))
        val seas = interior.groupBy("dow")
          .agg((sum(col("det_units")).cast("double") / 7.0 / count(lit(1))).as("seasonal"))
        graft.Tails.orderedSmall(
          interior.join(broadcast(seas), Seq("dow"))
            .select(
              col("day"), col("n").cast("long").as("n"),
              (col("sum7").cast("double") / 7.0).as("trend"),
              col("seasonal"),
              (col("n") - col("sum7").cast("double") / 7.0 - col("seasonal")).as("residual")),
          col("day"))
      })
  )
}
