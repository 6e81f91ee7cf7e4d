package graft.queries

import graft.{QueryDef, Tables}
import graft.analytics.Indicators
import graft.etl.Compress
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/analytic operator coverage (SURVEY.md §2.5 W1–W6) over the
  * `events` tick table: lag + pct-change, tick compression, per-day
  * first/last, rolling Bollinger bands.
  */
object WindowQueries {

  val entries: Seq[QueryDef] = Seq(
    // time-RANGE window frame: trailing 1-hour sum/count per user — the
    // frame is defined by the ORDER-BY value (event time), not row
    // offsets, so it is partitioning-invariant and gap-robust. Exact
    // integer cents per the determinism contract.
    QueryDef(
      "trailing_window_1h",
      Some("""
        SELECT user_id, ts,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_1h_cents,
               CAST(COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_1h_n
        FROM events
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .select(
            col("user_id"), col("ts"),
            expr("""CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)""")
              .as("trail_1h_cents"),
            expr("""CAST(COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)""")
              .as("trail_1h_n"))
          .orderBy("user_id", "ts")
      }),

    // navigation-function battery: lead, first/last/nth over an explicit
    // full-partition frame (the default frame stops at CURRENT ROW, which
    // makes last_value a no-op — classic trap, pinned identically in both
    // engines), percent_rank over a total order (exact rational → no
    // rounding needed)
    QueryDef(
      "nav_functions",
      Some("""
        SELECT user_id, ts,
               lead(value, 2) OVER w AS lead2,
               first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_v,
               last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
               nth_value(value, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nth3,
               percent_rank() OVER (PARTITION BY user_id ORDER BY value, ts) AS pr
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wRank = Window.partitionBy(col("user_id")).orderBy(col("value"), col("ts"))
        Tables.events(spark, dir)
          .select(
            col("user_id"), col("ts"),
            lead(col("value"), 2).over(w).as("lead2"),
            first(col("value")).over(wFull).as("first_v"),
            last(col("value")).over(wFull).as("last_v"),
            nth_value(col("value"), 3).over(wFull).as("nth3"),
            percent_rank().over(wRank).as("pr"))
          .orderBy("user_id", "ts")
      }),

    QueryDef(
      "lag_pct_change",
      Some("""
        SELECT user_id, ts, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value,
               abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts))
                 / nullif(abs(lag(value) OVER (PARTITION BY user_id ORDER BY ts)), 0) AS pct_change
        FROM events
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("value"))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("pct_change",
            abs(col("value") - col("prev_value")) /
              when(abs(col("prev_value")) === 0, lit(null)).otherwise(abs(col("prev_value"))))
          .orderBy("user_id", "ts")
      }),

    QueryDef(
      "tick_compression",
      Some("""
        WITH t AS (
          SELECT user_id, ts, value,
                 CAST(ts AS DATE) AS day,
                 lag(value) OVER w AS prev,
                 lag(CAST(ts AS DATE)) OVER w AS prev_day,
                 lead(CAST(ts AS DATE)) OVER w AS next_day
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, ts, value FROM t
        WHERE coalesce(abs(value - prev) / nullif(abs(prev), 0) > 0.001, false)
           OR prev IS NULL
           OR next_day IS NULL
           OR prev_day <> day
           OR next_day <> day
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        Compress.tickCompression(
          Tables.events(spark, dir).select("user_id", "ts", "value"),
          key = "user_id", ts = "ts", value = "value")
          .orderBy("user_id", "ts")
      }),

    // identical semantics through the (key, day)-partitioned scale-out
    // implementation — same oracle as tick_compression
    QueryDef(
      "tick_compression_scaled",
      Some("""
        WITH t AS (
          SELECT user_id, ts, value,
                 CAST(ts AS DATE) AS day,
                 lag(value) OVER w AS prev,
                 lag(CAST(ts AS DATE)) OVER w AS prev_day,
                 lead(CAST(ts AS DATE)) OVER w AS next_day
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, ts, value FROM t
        WHERE coalesce(abs(value - prev) / nullif(abs(prev), 0) > 0.001, false)
           OR prev IS NULL
           OR next_day IS NULL
           OR prev_day <> day
           OR next_day <> day
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        Compress.tickCompressionScalable(
          Tables.events(spark, dir).select("user_id", "ts", "value"),
          key = "user_id", ts = "ts", value = "value")
          .orderBy("user_id", "ts")
      }),

    QueryDef(
      "first_last_day",
      Some("""
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               min_by(value, ts) AS first_value,
               max_by(value, ts) AS last_value
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
        ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        // Spark side exercises W3/W4's row_number formulation; the oracle
        // uses min_by/max_by — identical because ts is unique per key.
        val day = to_date(col("ts")).as("day")
        val ev = Tables.events(spark, dir).select(col("user_id"), day, col("ts"), col("value"))
        val wAsc  = Window.partitionBy(col("user_id"), col("day")).orderBy(col("ts"))
        val wDesc = Window.partitionBy(col("user_id"), col("day")).orderBy(col("ts").desc)
        ev.withColumn("_rna", row_number().over(wAsc))
          .withColumn("_rnd", row_number().over(wDesc))
          .filter(col("_rna") === 1 || col("_rnd") === 1)
          .groupBy(col("user_id"), col("day"))
          .agg(
            min(col("ts")).as("first_ts"),
            max(col("ts")).as("last_ts"),
            min_by(col("value"), col("ts")).as("first_value"),
            max_by(col("value"), col("ts")).as("last_value"))
          .orderBy("user_id", "day")
      }),

    // ranking family over a deterministic total order (ties impossible:
    // ts unique per key)
    QueryDef(
      "rank_functions",
      Some("""
        SELECT user_id, ts, value,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               cume_dist() OVER w AS cdist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value, ts)
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("ts"))
        Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("value"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("cdist", cume_dist().over(w))
          .orderBy("user_id", "ts")
      }),

    QueryDef(
      "bollinger",
      Some("""
        WITH t AS (
          SELECT user_id, ts, value,
                 CASE WHEN COUNT(*) OVER w = 20 THEN AVG(value) OVER w END AS mid,
                 CASE WHEN COUNT(*) OVER w = 20 THEN STDDEV_SAMP(value) OVER w END AS sd
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, ts, value,
               ROUND(mid, 4) AS bb_mid,
               ROUND(sd, 4) AS bb_std,
               ROUND(mid + 2 * sd, 4) AS bb_upper,
               ROUND(mid - 2 * sd, 4) AS bb_lower
        FROM t
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        Indicators.bollinger(
          Tables.events(spark, dir).select("user_id", "ts", "value"),
          key = "user_id", ts = "ts", close = "value", n = 20, numStd = 2.0)
          .withColumn("bb_mid", round(col("bb_mid"), 4))
          .withColumn("bb_std", round(col("bb_std"), 4))
          .withColumn("bb_upper", round(col("bb_upper"), 4))
          .withColumn("bb_lower", round(col("bb_lower"), 4))
          .orderBy("user_id", "ts")
      }),

    // SCD Type-2 dimension build from a change log: each purchase is a
    // change record; validity = [its ts, the NEXT change's ts), open
    // interval + current flag on the latest. One lead() window per key —
    // the standard warehouse dimension-history constructor (the SCD
    // last-writer query keeps only the head; this keeps the full
    // history). Timestamps are globally unique in the testdata, so the
    // interval edges are deterministic.
    QueryDef(
      "scd2_intervals",
      Some("""
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               value,
               CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ORDER BY user_id, valid_from
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts")
        Tables.events(spark, dir)
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"), col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"),
            col("value"),
            when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L).as("is_current"))
          .orderBy("user_id", "valid_from")
      })
  )
}
