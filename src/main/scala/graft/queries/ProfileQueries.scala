package graft.queries

import graft.{QueryDef, Tables}
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

/** Dataset-profiling operators a training-data pipeline runs before
  * ingestion: hierarchy rollups, per-column null/min/max/distinct
  * profiles, exact quantiles.
  */
object ProfileQueries {

  val entries: Seq[QueryDef] = Seq(
    // global percent_rank of every customer by account balance — the
    // whole-population ranking primitive behind percentile features and
    // leaderboards. The naive plan (`percent_rank() OVER (ORDER BY …)`,
    // no PARTITION BY — exactly what the oracle states) serializes every
    // row through ONE task; the engine computes the identical value from
    // operators/GlobalRank's two-phase range-shuffled row number as
    // (rk−1)/(n−1), with n a driver-side literal that comes free from
    // rank pass-1's per-partition offsets — no count(*) aggregate, no
    // scalar-attach join anywhere in the plan. The partitionless-window
    // plan audit keeps the naive shape banned.
    QueryDef(
      "global_percent_rank",
      Some("""
        SELECT c_custkey,
               round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 4) AS pr
        FROM customer
        ORDER BY c_custkey
      """.stripMargin.trim),
      (spark, dir) => {
        import graft.operators.GlobalRank
        val c = Tables.customer(spark, dir).select("c_custkey", "c_acctbal")
        // population size comes FREE from the rank's own pass-1 offsets —
        // no count(*) aggregate, no 1-row broadcast attach in the plan
        val (ranked, n) = GlobalRank.withGlobalRankAndCount(c, "_rk",
          Seq(col("c_acctbal"), col("c_custkey")))
        // The output is population-sized BY CONSTRUCTION — the one tail in
        // the catalog that grows O(n) — so orderedSmall's single sorted
        // partition is the wrong shape (it would re-serialize the whole
        // ranking through one task, un-doing GlobalRank's point, and trip
        // the funnel audit at larger SFs). Fat-output pattern (Tails doc):
        // range-sort the NARROW columns, project the derived pr AFTER —
        // total order preserved, no Exchange SinglePartition anywhere.
        ranked
          .orderBy(col("c_custkey"))
          .select(col("c_custkey"),
            // SQL defines percent_rank of a 1-row population as 0, and
            // ANSI would throw on the 0 divisor — guard like the oracle
            round(if (n > 1) (col("_rk") - 1).cast("double") / lit(n - 1.0)
                  else lit(0.0), 4).as("pr"))
      }),

    // A/B test readout: users deterministically hash-split into two
    // variants (the same md5-bucket idiom every sampler uses — no RNG, so
    // assignment is reproducible across engines and reruns); "converted" =
    // purchase share above the 1/5 event-type base rate, stated as exact
    // integer arithmetic (5·purchases > events) so it is scale-free and
    // non-degenerate at every SF (a rawer "any purchase" metric saturates
    // to p=1 and zeroes the pooled variance — found at sf0.01). The
    // two-proportion pooled z-score decides the experiment. One
    // user-grain agg + one global agg; at 100 TB the variant stats are
    // map-side partials over the user key, never a per-user collect. z is
    // stated with identical arithmetic in both engines, rounded to 4.
    QueryDef(
      "ab_test_zscore",
      Some(s"""
        WITH assign AS (
          SELECT user_id, ${TextAnalysis.hashBucketSqlDuck("user_id", 2)} AS variant,
                 CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                           > count(*) THEN 1 ELSE 0 END AS converted
          FROM events GROUP BY user_id
        ), v AS (
          SELECT variant, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(converted) AS BIGINT) AS conv
          FROM assign GROUP BY variant
        ), wide AS (
          SELECT
            max(CASE WHEN variant = 0 THEN n END) AS n_a,
            max(CASE WHEN variant = 1 THEN n END) AS n_b,
            max(CASE WHEN variant = 0 THEN conv END) AS conv_a,
            max(CASE WHEN variant = 1 THEN conv END) AS conv_b
          FROM v
        )
        SELECT n_a, n_b, conv_a, conv_b,
               round(CAST(conv_a AS DOUBLE) / n_a, 4) AS p_a,
               round(CAST(conv_b AS DOUBLE) / n_b, 4) AS p_b,
               round(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
                     THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                     / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z
        FROM wide
      """.stripMargin.trim),
      (spark, dir) => {
        val assign = Tables.events(spark, dir)
          .groupBy("user_id")
          .agg((when(lit(5) * sum(when(col("event_type") === "purchase", 1).otherwise(0))
              > count(lit(1)), 1).otherwise(0)).as("converted"))
          .withColumn("variant", expr(TextAnalysis.hashBucketExpr("user_id", 2)))
        val v = assign.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum("converted").cast("long").as("conv"))
        val wide = v.agg(
          max(when(col("variant") === 0, col("n"))).as("n_a"),
          max(when(col("variant") === 1, col("n"))).as("n_b"),
          max(when(col("variant") === 0, col("conv"))).as("conv_a"),
          max(when(col("variant") === 1, col("conv"))).as("conv_b"))
        val pa = col("conv_a").cast("double") / col("n_a")
        val pb = col("conv_b").cast("double") / col("n_b")
        val pPool = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
        wide.select(
          col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          round(pa, 4).as("p_a"), round(pb, 4).as("p_b"),
          // pooled rate 0 or 1 (e.g. a zero-conversion slice) zeroes the
          // variance: NULL there, like the oracle's CASE — an unguarded /
          // is a Spark 4 ANSI DIVIDE_BY_ZERO (the twap/corr_vu bug class)
          round(when(pPool > 0 && pPool < 1, (pa - pb) /
            sqrt(pPool * (lit(1.0) - pPool) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))), 4).as("z"))
      }),

    // top clickstream 3-paths: event_transitions' higher-order sibling —
    // the (e1 → e2 → e3) trigram counts over per-user event sequences
    // (unique timestamps ⇒ lag windows are a total order), top 20 with a
    // deterministic tie-break. The path-mining primitive behind "what do
    // users do before purchasing".
    QueryDef(
      "event_paths_top",
      Some("""
        WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts) AS p1,
                 lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts) AS p2
          FROM events
        )
        SELECT p2 AS e1, p1 AS e2, event_type AS e3,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE p2 IS NOT NULL
        GROUP BY p2, p1, event_type
        ORDER BY n DESC, e1, e2, e3
        LIMIT 20
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts")
        Tables.events(spark, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("p1", lag(col("event_type"), 1).over(w))
          .withColumn("p2", lag(col("event_type"), 2).over(w))
          .filter(col("p2").isNotNull)
          .groupBy(col("p2").as("e1"), col("p1").as("e2"), col("event_type").as("e3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
          .limit(20)
      }),

    // Benford first-digit audit over order totals — the fraud/synthetic-
    // data screen: observed first-significant-digit shares vs Benford's
    // log10(1 + 1/d) expectation, with the absolute deviation per digit.
    // First digit extracted STRUCTURALLY (first char of the integer part
    // of the absolute value) — identical string logic both engines, no
    // float log-arithmetic on the extraction path; expected shares are
    // one log10 call rounded at 4 like every float in the contract.
    QueryDef(
      "benford_digits",
      Some("""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders WHERE abs(o_totalprice) >= 1
        ), c AS (
          SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
        ), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / total, 4) AS observed,
               round(log10(1.0 + 1.0 / digit), 4) AS expected,
               round(abs(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit)), 4) AS abs_dev
        FROM c CROSS JOIN t
        ORDER BY digit
      """.stripMargin.trim),
      (spark, dir) => {
        val digit = substring(floor(abs(col("o_totalprice"))).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit")
        val c = Tables.orders(spark, dir)
          .filter(abs(col("o_totalprice")) >= 1)
          .select(digit)
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val t = c.agg(sum(col("n")).as("total"))
        graft.Tails.orderedSmall(
          c.crossJoin(broadcast(t))
            .select(col("digit"), col("n"),
              round(col("n").cast("double") / col("total"), 4).as("observed"),
              round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("expected"),
              round(abs(col("n").cast("double") / col("total") -
                log10(lit(1.0) + lit(1.0) / col("digit"))), 4).as("abs_dev")),
          col("digit"))
      }),

    // survivorship (golden record): one best row per user assembled
    // attribute-by-attribute from the event stream — last-observed
    // event_type/value by event time (timestamps are globally unique, so
    // max_by/arg_max ties cannot occur), first-seen date, lifetime
    // volume as exact cents. The MDM merge step after identity
    // resolution; one user-keyed agg, map-side combinable.
    QueryDef(
      "golden_record",
      Some("""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(ts) AS DATE) AS first_seen,
               arg_max(event_type, ts) AS last_type,
               arg_max(value, ts) AS last_value,
               CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS lifetime_cents
        FROM events GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        graft.Tails.orderedSmall(
          Tables.events(spark, dir).groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            to_date(min(col("ts"))).as("first_seen"),
            max_by(col("event_type"), col("ts")).as("last_type"),
            max_by(col("value"), col("ts")).as("last_value"),
            sum(round(col("value") * 100).cast("long")).as("lifetime_cents")),
          col("user_id"))
      }),

    // time-to-convert funnel metric: per signup-month cohort, the
    // median / p90 days from a user's FIRST signup to their first
    // purchase AFTER it (non-converters excluded by the join+filter, and
    // counted). Day deltas are exact micros → one division; quantiles
    // via the shared ExactQuantiles rank+interpolation construction —
    // identical operands through identical operations in both engines,
    // so the formerly-argued 1-ulp interpolation class cannot occur.
    QueryDef(
      "time_to_convert",
      Some(s"""
        WITH s AS (
          SELECT user_id, min(ts) AS signup_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ), p AS (
          SELECT e.user_id, min(e.ts) AS purchase_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
          GROUP BY e.user_id
        ), d AS (
          SELECT CAST(date_trunc('month', s.signup_ts) AS DATE) AS cohort_month,
                 CAST(epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS DOUBLE) / 86400000000.0 AS days
          FROM s JOIN p ON s.user_id = p.user_id
        ), q AS (
          ${graft.operators.ExactQuantiles.oracleSql("d", Seq("cohort_month"), "days",
             Seq("p50_days" -> 0.5, "p90_days" -> 0.9))}
        ), c AS (
          SELECT cohort_month, CAST(count(*) AS BIGINT) AS n_converted
          FROM d GROUP BY cohort_month
        )
        SELECT c.cohort_month, c.n_converted, q.p50_days, q.p90_days
        FROM c JOIN q USING (cohort_month) ORDER BY cohort_month
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val s = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(s, Seq("user_id"))
          .filter(col("ts") > col("signup_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
        val d = s.join(p, Seq("user_id"))
          .select(to_date(date_trunc("month", col("signup_ts"))).as("cohort_month"),
            ((unix_micros(col("purchase_ts")) - unix_micros(col("signup_ts")))
              .cast("double") / 86400000000.0).as("days"))
        val q = graft.operators.ExactQuantiles.perGroup(
          d, Seq("cohort_month"), "days", Seq("p50_days" -> 0.5, "p90_days" -> 0.9))
        val c = d.groupBy("cohort_month").agg(count(lit(1)).as("n_converted"))
        graft.Tails.orderedSmall(
          c.join(q, Seq("cohort_month"))
            .select("cohort_month", "n_converted", "p50_days", "p90_days"),
          col("cohort_month"))
      }),

    // DAU / WAU / stickiness — the engagement triple every product
    // dashboard draws. WAU (distinct users in the trailing 7 days) is
    // computed WITHOUT a per-day range self-join: each distinct
    // (day, user) pair explodes to the ≤7 window-END days it belongs to,
    // then one distinct-count per end day — shuffle keys are
    // (day, user), work ∝ active-pairs × 7, never days × corpus. Early
    // days carry partial windows by the standard convention
    QueryDef(
      "dau_wau_stickiness",
      Some("""
        WITH du AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ), dau AS (
          SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY day
        ), wau AS (
          SELECT d.day, count(DISTINCT du.user_id) AS wau
          FROM dau d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day
        )
        SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
               round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
        FROM dau d JOIN wau w USING (day)
        ORDER BY day
      """.stripMargin.trim),
      (spark, dir) => {
        val du = Tables.events(spark, dir)
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
        val wau = du
          .withColumn("day", explode(expr("sequence(day, date_add(day, 6))")))
          .groupBy("day").agg(countDistinct("user_id").as("wau"))
        dau.join(wau, "day") // inner: windows ending past the data range drop out
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
          .orderBy("day")
      }),

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

    // statistical aggregates per group (corr/covar/stddev/variance) —
    // multi-row float aggregates, so rounded to 4 decimals in BOTH
    // engines per the determinism contract (summation order differs)
    QueryDef(
      "corr_stats",
      // Pearson from explicit moments with a guarded division, not
      // corr(): Spark 4 ANSI makes corr THROW on a zero-variance group
      // where DuckDB returns NULL (the acf_lags finding; a constant
      // value column in one event_type would crash the report)
      Some("""
        WITH m AS (
          SELECT event_type, COUNT(*) AS n,
                 covar_samp(value, CAST(user_id AS DOUBLE)) AS cov_vu,
                 stddev_samp(value) AS sd_v,
                 stddev_samp(CAST(user_id AS DOUBLE)) AS sd_u,
                 var_samp(value) AS var_v
          FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               ROUND(CASE WHEN sd_v > 0 AND sd_u > 0 THEN cov_vu / (sd_v * sd_u) END, 4) AS corr_vu,
               ROUND(cov_vu, 4) AS covar_vu,
               ROUND(sd_v, 4) AS sd_value,
               ROUND(var_v, 4) AS var_value
        FROM m ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        val m = Tables.events(spark, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            covar_samp(col("value"), col("user_id").cast("double")).as("cov_vu"),
            stddev_samp(col("value")).as("sd_v"),
            stddev_samp(col("user_id").cast("double")).as("sd_u"),
            var_samp(col("value")).as("var_v"))
        m.select(col("event_type"), col("n"),
            round(when(col("sd_v") > 0 && col("sd_u") > 0,
              col("cov_vu") / (col("sd_v") * col("sd_u"))), 4).as("corr_vu"),
            round(col("cov_vu"), 4).as("covar_vu"),
            round(col("sd_v"), 4).as("sd_value"),
            round(col("var_v"), 4).as("var_value"))
          .orderBy("event_type")
      }),

    // CUBE hierarchy with GROUPING() markers: all 4 grouping sets of
    // (year, status) in one pass — same partial-agg expansion as ROLLUP
    QueryDef(
      "cube_orders",
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus AS status,
               CAST(GROUPING(CAST(year(o_orderdate) AS BIGINT)) AS BIGINT) AS g_y,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)
        ORDER BY g_y, g_s, y NULLS FIRST, status NULLS FIRST
      """.stripMargin.trim),
      (spark, dir) => {
        // grouping() resolves structurally against the cube columns, so
        // the grouped expressions must be plain attributes (pre-computed
        // via withColumn), not aliased expressions
        Tables.orders(spark, dir)
          .withColumn("y", year(col("o_orderdate")).cast("long"))
          .withColumn("status", col("o_orderstatus"))
          .cube(col("y"), col("status"))
          .agg(
            grouping(col("y")).cast("long").as("g_y"),
            grouping(col("status")).cast("long").as("g_s"),
            count(lit(1)).as("n"))
          .select("y", "status", "g_y", "g_s", "n")
          .orderBy(col("g_y"), col("g_s"), col("y").asc_nulls_first,
            col("status").asc_nulls_first)
      }),

    // deterministic STRATIFIED sampling: ~20% per stratum by content
    // hash — retry-safe and engine-reproducible where sample()/rand()
    // re-roll per task attempt (same machinery as train_test_split,
    // grouped). Emits per-stratum sampled counts plus the exact ids kept
    QueryDef(
      "stratified_sample",
      Some(s"""
        WITH s AS (
          SELECT event_id, event_type,
                 ${TextAnalysis.hashBucketSqlDuck("event_id", 100)} AS bucket
          FROM events
        )
        SELECT event_type, event_id
        FROM s WHERE bucket < 20
        ORDER BY event_type, event_id
      """.stripMargin.trim),
      (spark, dir) => {
        val bucket = expr(TextAnalysis.hashBucketExpr("event_id", 100))
        Tables.events(spark, dir)
          .select(col("event_type"), col("event_id"), bucket.as("bucket"))
          .filter(col("bucket") < 20)
          .select("event_type", "event_id")
          .orderBy("event_type", "event_id")
      }),

    // TWAP (time-weighted average price) per (user, day): each tick's
    // value weighted by the micros until the next tick of the same day.
    // EXACT fixed-point form: price quantized to cent units, so the
    // weighted numerator sum(cents*wt) is pure int64 arithmetic — the
    // intraday weights sum to at most a day of micros (8.64e10), so
    // cents·wt totals stay < 5e15 at ANY corpus scale — and the two
    // final divisions see identical operands in both engines.
    QueryDef(
      "twap_daily",
      Some("""
        WITH t AS (
          SELECT user_id, CAST(ts AS DATE) AS day, ts, value,
                 lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts) AS next_ts
          FROM events
        ), w AS (
          SELECT user_id, day, CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(date_diff('microsecond', ts, next_ts) AS BIGINT) AS wt
          FROM t WHERE next_ts IS NOT NULL
        )
        SELECT user_id, day, COUNT(*) AS n,
               CASE WHEN SUM(CAST(wt AS BIGINT)) > 0
                    THEN CAST(SUM(CAST(cents AS BIGINT) * wt) AS DOUBLE) / 100.0 / SUM(CAST(wt AS BIGINT))
               END AS twap
        FROM w
        GROUP BY user_id, day
        ORDER BY user_id, day
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.events(spark, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"), col("value"))
          .withColumn("next_ts", lead(col("ts"), 1).over(
            Window.partitionBy(col("user_id"), col("day")).orderBy(col("ts"))))
          .filter(col("next_ts").isNotNull)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("wt", (unix_micros(col("next_ts")) - unix_micros(col("ts"))))
          .groupBy(col("user_id"), col("day"))
          .agg(
            count(lit(1)).as("n"),
            // guarded: duplicate timestamps make every weight 0 in a
            // group, and ANSI division would throw where the oracle
            // semantics (and DuckDB) say NULL (degenerate-gauntlet find)
            when(sum(col("wt")) > 0,
              sum(col("cents") * col("wt")).cast("double") / 100.0 / sum(col("wt")))
              .as("twap"))
          .orderBy("user_id", "day")
      }),

    // skew-salted two-phase aggregation: SAME oracle as a plain GROUP BY
    // — the salt spreads a hot key across reducers in phase 1 and the
    // associative merge in phase 2 erases it from the RESULT. The oracle
    // equality IS the correctness claim for the skew-mitigation rewrite.
    QueryDef(
      "salted_agg_events",
      Some("""
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        graft.operators.Skew
          .saltedCountSum(ev, "user_id", "cents", "event_id", nSalts = 16)
          .orderBy("user_id")
      }),

    // median absolute deviation — the robust dispersion estimate that
    // survives the outliers stddev inflates on (winsorize's diagnostic
    // sibling): per-key median, then the median of absolute deviations
    // from it. Both medians via the shared ExactQuantiles rank +
    // interpolation construction (identical operands both engines), so
    // med, the per-row deviations, and mad are bit-identical doubles —
    // no interpolation-parity argument left to make.
    QueryDef(
      "mad_stats",
      Some(s"""
        WITH med AS (
          ${graft.operators.ExactQuantiles.oracleSql("events", Seq("user_id"), "value",
             Seq("med" -> 0.5))}
        ), dev AS (
          SELECT e.user_id, abs(e.value - m.med) AS dv
          FROM events e JOIN med m ON e.user_id = m.user_id
          WHERE e.value IS NOT NULL
        ), mad AS (
          ${graft.operators.ExactQuantiles.oracleSql("dev", Seq("user_id"), "dv",
             Seq("mad" -> 0.5))}
        ), cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
        )
        SELECT c.user_id, m.med, d.mad, c.n
        FROM cnt c JOIN med m ON c.user_id = m.user_id
                   JOIN mad d ON c.user_id = d.user_id
        ORDER BY c.user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir).select("user_id", "value")
        val med = graft.operators.ExactQuantiles.perGroup(
          ev, Seq("user_id"), "value", Seq("med" -> 0.5))
        val dev = ev.join(med, "user_id")
          .filter(col("value").isNotNull)
          .select(col("user_id"), abs(col("value") - col("med")).as("dv"))
        val mad = graft.operators.ExactQuantiles.perGroup(
          dev, Seq("user_id"), "dv", Seq("mad" -> 0.5))
        val cnt = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        cnt.join(med, "user_id").join(mad, "user_id")
          .select("user_id", "med", "mad", "n")
          .orderBy("user_id")
      }),

    // null-safe equi-join — the nullable-key trap: a plain `=` join
    // silently DROPS every null-key row (null = null is null, not
    // true), while <=> / IS NOT DISTINCT FROM matches them. Sector is
    // null for users divisible by 7; the pair counts prove the null
    // group joined (and Spark plans <=> as a hash join, not a BNLJ)
    QueryDef(
      "null_safe_join",
      Some("""
        WITH a AS (
          SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 10 END AS sector,
                 count(*) AS n_events
          FROM events GROUP BY 1
        ), b AS (
          SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 10 END AS sector,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events GROUP BY 1
        )
        SELECT a.sector, a.n_events, b.n_users
        FROM a JOIN b ON a.sector IS NOT DISTINCT FROM b.sector
        ORDER BY a.sector NULLS FIRST
      """.stripMargin.trim),
      (spark, dir) => {
        val sector = when(col("user_id") % 7 === 0, lit(null))
          .otherwise(col("user_id") % 10).as("sector")
        val ev = Tables.events(spark, dir)
        val a = ev.select(sector).groupBy("sector")
          .agg(count(lit(1)).as("n_events"))
        val b = ev.select(col("user_id"), sector).groupBy("sector")
          .agg(countDistinct(col("user_id")).as("n_users"))
        a.join(b, a("sector") <=> b("sector"))
          .select(a("sector"), col("n_events"), col("n_users"))
          .orderBy(col("sector").asc_nulls_first)
      }),

    // event-transition matrix (first-order Markov over each user's
    // clickstream): lag the previous event type per user, count global
    // (prev → next) transitions + the probability given prev. The lag
    // window's ORDER BY ts is total per user (event timestamps are
    // globally unique), so the pairs are deterministic; probability is a
    // ratio of two exact counts
    QueryDef(
      "event_transitions",
      Some("""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
          FROM events
        )
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n,
               round(CAST(count(*) AS DOUBLE) /
                     sum(CAST(count(*) AS BIGINT)) OVER (PARTITION BY prev_type), 4) AS p
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type, next_type
      """.stripMargin.trim),
      (spark, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"))
        val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))
        Tables.events(spark, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(wp), 4))
          .orderBy("prev_type", "next_type")
      }),

    // data-expectations report — the dbt-tests / Great-Expectations
    // analog run before ingesting a batch: each named check is one
    // aggregate, unioned into a (check, n_violations, pass) report. The
    // checks deliberately span the four families: completeness (nulls),
    // validity (range), uniqueness (duplicate keys), and referential
    // integrity (orphans via anti join)
    QueryDef(
      "expectations_report",
      Some("""
        SELECT * FROM (
          SELECT 'orders_null_custkey' AS check_name,
                 CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_violations
          FROM orders
          UNION ALL
          SELECT 'orders_nonpositive_price',
                 CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orders_dup_orderkey',
                 CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
          FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
          UNION ALL
          SELECT 'lineitem_orphan_orderkey',
                 CAST(count(*) AS BIGINT)
          FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'lineitem_qty_out_of_range',
                 CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'events_value_not_finite',
                 CAST(count(*) FILTER (isnan(value) OR isinf(value)) AS BIGINT)
          FROM events
        )
        ORDER BY check_name
      """.stripMargin.trim),
      (spark, dir) => {
        val orders = Tables.orders(spark, dir)
        val lineitem = Tables.lineitem(spark, dir)
        def report(name: String, n: org.apache.spark.sql.DataFrame) =
          n.select(lit(name).as("check_name"), col("n_violations").cast("long"))
        val checks = Seq(
          report("orders_null_custkey",
            orders.agg(count(when(col("o_custkey").isNull, 1)).as("n_violations"))),
          report("orders_nonpositive_price",
            orders.agg(count(when(col("o_totalprice") <= 0, 1)).as("n_violations"))),
          report("orders_dup_orderkey",
            orders.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
              .filter(col("cnt") > 1)
              .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))),
          report("lineitem_orphan_orderkey",
            lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
              .agg(count(lit(1)).as("n_violations"))),
          report("lineitem_qty_out_of_range",
            lineitem.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
              .as("n_violations"))),
          // the NaN/Infinity gate: exact-cents arithmetic downstream
          // RIGHTLY refuses non-finite values (ANSI cast — in DuckDB
          // too), so the expectations pass is where they must be caught,
          // not the revenue query that would crash on them
          report("events_value_not_finite",
            Tables.events(spark, dir).agg(
              count(when(isnan(col("value")) ||
                col("value") === Double.PositiveInfinity ||
                col("value") === Double.NegativeInfinity, 1)).as("n_violations"))))
        checks.reduce(_ unionByName _).orderBy("check_name")
      }),

    // tall→wide PIVOT — the inverse reshape of unpivot_quartiles: one
    // column per event type, count + exact cent-sum per (day, type) cell.
    // The pivot VALUES are declared explicitly, so Spark skips the
    // driver-side distinct pass a bare pivot() needs (at 100 TB that pass
    // is a full extra scan); absent cells coalesce to the 0 the oracle's
    // FILTER aggregates produce
    QueryDef(
      "pivot_event_types",
      Some("""
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
               CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) FILTER (event_type = 'click'), 0) AS BIGINT) AS cents_click,
               CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) FILTER (event_type = 'purchase'), 0) AS BIGINT) AS cents_purchase,
               CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) FILTER (event_type = 'view'), 0) AS BIGINT) AS cents_view
        FROM events
        GROUP BY CAST(ts AS DATE)
        ORDER BY day
      """.stripMargin.trim),
      (spark, dir) => {
        val types = Seq("click", "purchase", "view")
        val wide = Tables.events(spark, dir)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("day")
          .pivot("event_type", types)
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        val cols = col("day") +:
          (types.map(t => coalesce(col(s"${t}_n"), lit(0L)).as(s"n_$t")) ++
            types.map(t => coalesce(col(s"${t}_cents"), lit(0L)).as(s"cents_$t")))
        wide.select(cols: _*).orderBy("day")
      }),

    // wide→tall UNPIVOT (stack) + ntile quartile binning — the reshape a
    // feature-distribution monitor runs over candle columns. ntile is
    // deterministic here because the window's ORDER BY is total
    // ((v, user_id, day) unique); the oracle unpivots via UNION ALL
    QueryDef(
      "unpivot_quartiles",
      Some("""
        WITH candles AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 min_by(value, ts) AS open, max(value) AS high,
                 min(value) AS low, max_by(value, ts) AS close
          FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), tall AS (
          SELECT user_id, day, 'open' AS metric, open AS v FROM candles
          UNION ALL SELECT user_id, day, 'high', high FROM candles
          UNION ALL SELECT user_id, day, 'low', low FROM candles
          UNION ALL SELECT user_id, day, 'close', close FROM candles
        ), binned AS (
          SELECT metric, v,
                 ntile(4) OVER (PARTITION BY metric ORDER BY v, user_id, day) AS quartile
          FROM tall
        )
        SELECT metric, CAST(quartile AS BIGINT) AS quartile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS mean_v,
               min(v) AS min_v, max(v) AS max_v
        FROM binned
        GROUP BY metric, quartile
        ORDER BY metric, quartile
      """.stripMargin.trim),
      (spark, dir) => {
        val candles = Tables.events(spark, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(
            expr("min_by(value, ts)").as("open"), max(col("value")).as("high"),
            min(col("value")).as("low"), expr("max_by(value, ts)").as("close"))
        val tall = candles.selectExpr("user_id", "day",
          "stack(4, 'open', open, 'high', high, 'low', low, 'close', close) AS (metric, v)")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("metric")).orderBy(col("v"), col("user_id"), col("day"))
        tall.withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy(col("metric"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            // exact fixed-point mean on the cent price grid — no
            // summation-order drift (r13 whitelist-conversion pattern)
            (sum(round(col("v") * 100).cast("long")).cast("double") / 100.0 / count(lit(1)))
              .as("mean_v"),
            min(col("v")).as("min_v"), max(col("v")).as("max_v"))
          .orderBy("metric", "quartile")
      }),

    // exact interpolated quantiles per group, via the shared
    // ExactQuantiles rank + interpolation construction: order statistics
    // are exact row selections and the interpolation expression is the
    // same text in both engines — bit-identical doubles by construction
    // (quantile_cont and percentile agree on the DEFINITION but not the
    // last-ulp FORMULA; this removes the parity argument)
    QueryDef(
      "value_quantiles",
      Some(s"""
        WITH q AS (
          ${graft.operators.ExactQuantiles.oracleSql("events", Seq("event_type"), "value",
             Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))}
        ), c AS (
          SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        )
        SELECT c.event_type, c.n, q.p50, q.p90, q.p99
        FROM c JOIN q USING (event_type)
        ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val q = graft.operators.ExactQuantiles.perGroup(
          ev, Seq("event_type"), "value",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        val c = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        c.join(q, Seq("event_type"))
          .select("event_type", "n", "p50", "p90", "p99")
          .orderBy("event_type")
      }),

    // winsorized robust statistics: clamp each group's values to its
    // [p05, p95] before the moments — the outlier-robust normalization a
    // feature pipeline applies before training. Bounds via the shared
    // ExactQuantiles construction (bit-identical doubles both engines),
    // rounded to the 1e-6 grid so clamped values sit on an integer
    // micro grid; moments are then EXACT integer sums (cents for the
    // raw mean, micros and squared-micros in int128/DECIMAL(38,0) for
    // the winsorized mean/std — the r13 fixed-point pattern, one tier
    // wider for the sum of squares) with one trailing float expression
    // over identical operands. The strict `value < lo` boundary test
    // compares identical doubles — engine-stable by construction, not
    // by the r11 grid-rounding mitigation alone. The tiny per-group
    // bounds table broadcast-joins back, so the big side shuffles only
    // for the final group agg (at 100 TB: swap for approx_percentile,
    // same plan shape).
    QueryDef(
      "winsorize_stats",
      Some(s"""
        WITH b AS (
          SELECT event_type, round(p05, 6) AS lo, round(p95, 6) AS hi
          FROM (
            ${graft.operators.ExactQuantiles.oracleSql("events", Seq("event_type"), "value",
               Seq("p05" -> 0.05, "p95" -> 0.95))}
          ) _bq
        ), j AS (
          SELECT e.event_type, e.value, b.lo, b.hi,
                 CAST(round(e.value * 100e0) AS BIGINT) AS cents,
                 CAST(round(greatest(b.lo, least(b.hi, e.value)) * 1000000e0) AS BIGINT) AS wq
          FROM events e JOIN b USING (event_type)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END AS BIGINT)) AS BIGINT) AS n_clamped,
               lo, hi,
               round(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100e0 / count(value), 4) AS raw_mean,
               round(CAST(SUM(CAST(wq AS HUGEINT)) AS DOUBLE) / 1000000e0 / count(value), 4) AS wins_mean,
               round(sqrt(greatest((CAST(SUM(CAST(wq AS HUGEINT) * wq) AS DOUBLE) / 1000000000000e0
                 - (CAST(SUM(CAST(wq AS HUGEINT)) AS DOUBLE) / 1000000e0) * (CAST(SUM(CAST(wq AS HUGEINT)) AS DOUBLE) / 1000000e0) / count(value))
                 / (count(value) - 1), 0e0)), 4) AS wins_std
        FROM j
        GROUP BY event_type, lo, hi
        ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val ev = Tables.events(spark, dir)
        val bounds = graft.operators.ExactQuantiles.perGroup(
            ev, Seq("event_type"), "value", Seq("p05" -> 0.05, "p95" -> 0.95))
          .select(col("event_type"),
            round(col("p05"), 6).as("lo"), round(col("p95"), 6).as("hi"))
        val clamped = greatest(col("lo"), least(col("hi"), col("value")))
        val cents = round(col("value") * 100).cast("long")
        val wq = round(clamped * 1000000L).cast("long")
        val j = ev.join(broadcast(bounds), Seq("event_type"))
          .select(col("event_type"), col("value"), col("lo"), col("hi"),
            cents.as("cents"), wq.as("wq"))
        val nv = count(col("value"))
        val s1 = sum(col("wq").cast(DecimalType(38, 0))).cast("double")
        val s2 = sum(col("wq").cast(DecimalType(38, 0)) * col("wq")).cast("double")
        j.groupBy(col("event_type"), col("lo"), col("hi"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
              .otherwise(0L)).as("n_clamped"),
            round(sum(col("cents").cast(DecimalType(38, 0))).cast("double") / 100.0 / nv, 4)
              .as("raw_mean"),
            round(s1 / 1000000.0 / nv, 4).as("wins_mean"),
            round(sqrt(greatest(
              (s2 / 1000000000000.0 - (s1 / 1000000.0) * (s1 / 1000000.0) / nv) / (nv - 1),
              lit(0.0))), 4).as("wins_std"))
          .select(col("event_type"), col("n"), col("n_clamped"), col("lo"), col("hi"),
            col("raw_mean"), col("wins_mean"), col("wins_std"))
          .orderBy("event_type")
      }),

    // per-key z-score outlier detection: mean/stddev over each key's
    // full history (one window partition), flag |z| > 2.5. The filter
    // boundary sits on a float aggregate — safe because cross-engine
    // summation drift is ~1e-13 relative while z-values are O(1) apart
    QueryDef(
      "zscore_anomaly",
      Some("""
        WITH s AS (
          SELECT user_id, ts, value,
                 avg(value) OVER w AS mu,
                 stddev_samp(value) OVER w AS sd
          FROM events
          WINDOW w AS (PARTITION BY user_id)
        )
        SELECT user_id, ts, value, round((value - mu) / nullif(sd, 0), 4) AS z
        FROM s
        WHERE abs((value - mu) / nullif(sd, 0)) > 2.5
        ORDER BY user_id, ts
      """.stripMargin.trim),
      (spark, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        val z = (col("value") - avg(col("value")).over(w)) /
          when(stddev_samp(col("value")).over(w) === 0, lit(null))
            .otherwise(stddev_samp(col("value")).over(w))
        Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("value"), z.as("_z"))
          .filter(abs(col("_z")) > 2.5)
          .select(col("user_id"), col("ts"), col("value"), round(col("_z"), 4).as("z"))
          .orderBy("user_id", "ts")
      }),

    // cohort retention triangle: users grouped by first-SIGNUP day, then
    // for each (cohort, day-offset) cell the distinct users still active
    // — the table every growth dashboard draws. Signup (not any-event)
    // cohorts because the synthetic users are active from day one; only
    // post-signup activity counts. Two user-keyed aggs + one join; the
    // ratio divides two exact counts, so round(4) is deterministic (no
    // summation drift)
    QueryDef(
      "cohort_retention",
      Some("""
        WITH f AS (
          SELECT user_id, CAST(min(ts) AS DATE) AS cohort
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), a AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), j AS (
          SELECT f.cohort,
                 CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset,
                 a.user_id
          FROM a JOIN f ON a.user_id = f.user_id
          WHERE a.d >= f.cohort
        ), cs AS (
          SELECT cohort, count(DISTINCT user_id) AS cohort_size FROM f GROUP BY cohort
        )
        SELECT j.cohort, j.day_offset,
               CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
               round(CAST(count(DISTINCT j.user_id) AS DOUBLE) / any_value(cs.cohort_size), 4) AS retention
        FROM j JOIN cs ON j.cohort = cs.cohort
        GROUP BY j.cohort, j.day_offset
        ORDER BY j.cohort, j.day_offset
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir).select("user_id", "ts", "event_type")
        graft.analytics.Funnels.cohortRetention(ev)
          .orderBy("cohort", "day_offset")
      }),

    // staged funnel analysis: first view → first click AFTER that view →
    // first purchase AFTER that click, per user. Each stage is one
    // filtered min-aggregate joined on the key — all shuffles on
    // user_id, no window over the full event stream
    QueryDef(
      "funnel_stages",
      Some("""
        WITH v AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id
        )
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(1 + (t_click IS NOT NULL)::INT + (t_purchase IS NOT NULL)::INT AS BIGINT) AS stages
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
        ORDER BY v.user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
        graft.analytics.Funnels.funnelStages(ev).orderBy("user_id")
      }),

    // order-insensitive table checksum — row-level parity validation for
    // a migration (exactly how a reference→graft cutover would be
    // audited): per-row 60-bit md5 key REDUCED MOD 1e9+7 (so the plain
    // BIGINT sum stays exact up to ~9e9 rows — the mod is what makes the
    // sum overflow-safe, not the key width), summed into one BIGINT.
    // Doubles render via exact integer cents, dates via a fixed format,
    // so both engines hash identical strings; the sum is
    // order-independent, so partitioning cannot change it
    QueryDef(
      "table_checksum",
      Some("""
        SELECT CAST(SUM(CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) % 1000000007) AS BIGINT) AS checksum,
               COUNT(*) AS n_rows
        FROM (
          SELECT concat_ws('|',
                   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                   o_orderstatus,
                   CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                   strftime(o_orderdate, '%Y-%m-%d'),
                   o_orderpriority) AS k
          FROM orders) t
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.orders(spark, dir)
          .select(concat_ws("|",
            col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
            col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").cast("string"),
            date_format(col("o_orderdate"), "yyyy-MM-dd"),
            col("o_orderpriority")).as("k"))
          .select(expr("cast(conv(substring(md5(k), 1, 15), 16, 10) as bigint) % 1000000007").as("h"))
          .agg(sum(col("h")).cast("long").as("checksum"), count(lit(1)).as("n_rows"))
      }),

    // partition-grain checksums: the same order-insensitive row-hash sum
    // as table_checksum, keyed by month — the audit that localizes WHICH
    // partitions diverge after a migration/backfill, so only those are
    // re-synced. One groupBy on the partition key; at 100 TB each
    // partition's sum partial-aggregates map-side, and comparing two
    // warehouses is a tiny per-day join of these rows
    QueryDef(
      "partition_checksums",
      Some("""
        SELECT month,
               CAST(SUM(CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) % 1000000007) AS BIGINT) AS checksum,
               COUNT(*) AS n_rows
        FROM (
          SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                 concat_ws('|',
                   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                   o_orderstatus,
                   CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS k
          FROM orders) t
        GROUP BY month
        ORDER BY month
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.orders(spark, dir)
          .select(
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            concat_ws("|",
              col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
              col("o_orderstatus"),
              round(col("o_totalprice") * 100).cast("long").cast("string")).as("k"))
          .select(col("month"),
            expr("cast(conv(substring(md5(k), 1, 15), 16, 10) as bigint) % 1000000007").as("h"))
          .groupBy("month")
          .agg(sum(col("h")).cast("long").as("checksum"), count(lit(1)).as("n_rows"))
          .orderBy("month")
      }),

    // snapshot diff (CDC between table versions): version B is derived
    // from orders deterministically (drop every 97th key, bump price on
    // every 101st, insert a shifted copy of every 103rd) and the diff
    // recovers exactly those inserts/updates/deletes via one full-outer
    // join — output ∝ churn, not table size. Pairs with table_checksum
    // (whether versions diverge → where they diverge)
    QueryDef(
      "snapshot_diff",
      Some("""
        WITH a AS (
          SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        ), b AS (
          SELECT k, CASE WHEN k % 101 = 0 THEN cents + cents // 10 ELSE cents END AS cents
          FROM a WHERE k % 97 <> 0
          UNION ALL
          SELECT k + 10000000, cents + 7 FROM a WHERE k % 103 = 0
        ), d AS (
          SELECT coalesce(a.k, b.k) AS k,
                 a.cents AS old_cents, b.cents AS new_cents,
                 CASE WHEN a.k IS NULL THEN 'insert'
                      WHEN b.k IS NULL THEN 'delete'
                      WHEN a.cents <> b.cents THEN 'update'
                      ELSE 'same' END AS status
          FROM a FULL OUTER JOIN b ON a.k = b.k
        )
        SELECT k, status, old_cents, new_cents
        FROM d WHERE status <> 'same'
        ORDER BY k
      """.stripMargin.trim),
      (spark, dir) => {
        val a = Tables.orders(spark, dir).select(
          col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val b = a.filter(col("k") % 97 =!= 0)
          .select(col("k"),
            when(col("k") % 101 === 0, col("cents") + expr("cents DIV 10"))
              .otherwise(col("cents")).as("cents"))
          .unionByName(a.filter(col("k") % 103 === 0)
            .select((col("k") + 10000000L).as("k"), (col("cents") + 7).as("cents")))
        graft.operators.SnapshotDiff.diff(a, b, Seq("k"))
          .select("k", "status", "old_cents", "new_cents")
          .orderBy("k")
      }),

    // equi-width histogram with DATA-INDEPENDENT bucket bounds
    // (floor(value/10)): no global min/max scalar pass, so the whole
    // histogram is one partial+final hash aggregate — the profiling
    // shape that never bottlenecks. Bucket edges are exact double
    // multiples; both engines floor the same doubles
    QueryDef(
      "value_histogram",
      Some("""
        SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               round(min(value), 4) AS lo,
               round(max(value), 4) AS hi
        FROM events
        GROUP BY CAST(floor(value / 10) AS BIGINT)
        ORDER BY bucket
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .groupBy(floor(col("value") / 10).cast("long").as("bucket"))
          .agg(
            count(lit(1)).as("n"),
            round(min(col("value")), 4).as("lo"),
            round(max(col("value")), 4).as("hi"))
          .orderBy("bucket")
      }),

    // Per-key OLS trend: regression slope/intercept of value over time
    // for every user, via the SQL-standard regr_* aggregates — one
    // shuffle on the group key, partial-aggregated map-side (the five
    // running sums regr needs are all combinable), so a hot user costs
    // O(partitions) reducer rows at any scale. x is rebased to days
    // since 2024-01-01 with identical double arithmetic in both engines
    // (epoch-seconds double minus exact integer origin, / 86400.0);
    // round(,4) absorbs the engines' accumulation-order ulps.
    QueryDef(
      "trend_slope",
      Some("""
        WITH t AS (
          SELECT user_id, value,
                 (epoch(ts) - 1704067200.0) / 86400.0 AS x
          FROM events
        )
        SELECT user_id,
               CAST(regr_count(value, x) AS BIGINT) AS n,
               round(regr_slope(value, x), 4) AS slope,
               round(regr_intercept(value, x), 4) AS intercept
        FROM t
        GROUP BY user_id
        ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val t = Tables.events(spark, dir)
          .withColumn("x", (col("ts").cast("double") - lit(1704067200.0)) / 86400.0)
        graft.Tails.orderedSmall(
          t.groupBy("user_id").agg(
            regr_count(col("value"), col("x")).cast("long").as("n"),
            round(regr_slope(col("value"), col("x")), 4).as("slope"),
            round(regr_intercept(col("value"), col("x")), 4).as("intercept")),
          col("user_id"))
      }),

    // k-anonymity audit before a quasi-identifier release: any
    // (lang, source, size-bucket) combination identifying fewer than k
    // documents must be suppressed or generalized. One hash-agg on the
    // quasi-identifier tuple + a HAVING — the suppression list is
    // group-sized, never row-sized, so it collects safely at any corpus
    // scale.
    QueryDef(
      "k_anonymity",
      Some("""
        SELECT lang, source,
               CAST(n_chars // 100 AS BIGINT) AS size_bucket,
               COUNT(*) AS group_size
        FROM documents
        GROUP BY lang, source, CAST(n_chars // 100 AS BIGINT)
        HAVING COUNT(*) < 5
        ORDER BY lang, source, size_bucket
      """.stripMargin.trim),
      (spark, dir) => {
        graft.Tails.orderedSmall(
          Tables.documents(spark, dir)
            .groupBy(col("lang"), col("source"),
              floor(col("n_chars") / 100).cast("long").as("size_bucket"))
            .agg(count(lit(1)).as("group_size"))
            .filter(col("group_size") < 5),
          col("lang"), col("source"), col("size_bucket"))
      }),

    // RFM segmentation — the marketing-analytics classic: per-user
    // recency (days since last purchase vs corpus max day), frequency
    // (purchase count), monetary (exact cents), each cut into quartiles
    // by ntile over a TOTAL order (metric, user_id), so the segment
    // labels are deterministic in both engines.
    QueryDef(
      "rfm_segmentation",
      Some("""
        WITH p AS (
          SELECT user_id,
                 max(CAST(ts AS DATE)) AS last_day,
                 COUNT(*) AS freq,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), mx AS (
          SELECT max(last_day) AS corpus_last FROM p
        ), r AS (
          SELECT user_id,
                 CAST(mx.corpus_last - last_day AS BIGINT) AS recency_days,
                 freq, monetary_cents
          FROM p CROSS JOIN mx
        )
        SELECT user_id, recency_days, CAST(freq AS BIGINT) AS freq, monetary_cents,
               CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_quartile,
               CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_quartile,
               CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT) AS m_quartile
        FROM r
        ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        import graft.operators.GlobalRank
        val p = Tables.events(spark, dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(
            max(to_date(col("ts"))).as("last_day"),
            count(lit(1)).as("freq"),
            sum(round(col("value") * 100).cast("long")).as("monetary_cents"))
        val mx = p.agg(max(col("last_day")).as("corpus_last"))
        val r = p.crossJoin(broadcast(mx))
          .select(col("user_id"),
            datediff(col("corpus_last"), col("last_day")).cast("long").as("recency_days"),
            col("freq"), col("monetary_cents"))
        // r10: three GLOBAL ntiles used to be three unpartitioned windows
        // — every user through one task, three times (the partitionless-
        // window audit's biggest catch). Now: three two-phase GlobalRank
        // passes (range-shuffled, parallel) + the SQL-standard ntile
        // arithmetic from rank, with the population count taken from the
        // rank's own pass-1 offsets (r11) — no count(*) attach needed.
        var n = 0L
        val withRanks = Seq[(String, Seq[org.apache.spark.sql.Column])](
          ("_rk_r", Seq(col("recency_days"), col("user_id"))),
          ("_rk_f", Seq(col("freq").desc, col("user_id"))),
          ("_rk_m", Seq(col("monetary_cents").desc, col("user_id"))))
          .foldLeft(r) { case (acc, (rc, ord)) =>
            val (out, cnt) = GlobalRank.withGlobalRankAndCount(acc, rc, ord)
            n = cnt // rank passes preserve rows: any pass's total is |r|
            out
          }
        // user-grain output grows O(population) — fat-output tail (range
        // sort of the narrow ranked columns, quartile arithmetic projected
        // after), not orderedSmall's single sorted partition (r11; same
        // reasoning as global_percent_rank)
        withRanks
          .orderBy(col("user_id"))
          .select(
            col("user_id"), col("recency_days"), col("freq").cast("long").as("freq"),
            col("monetary_cents"),
            GlobalRank.ntileFromRank(col("_rk_r"), lit(n), 4).as("r_quartile"),
            GlobalRank.ntileFromRank(col("_rk_f"), lit(n), 4).as("f_quartile"),
            GlobalRank.ntileFromRank(col("_rk_m"), lit(n), 4).as("m_quartile"))
      }),

    // Gini coefficient of activity concentration (who generates the
    // volume): G = (2·Σ rank·x) / (n·Σx) − (n+1)/n over users ranked by
    // exact integer cents — the one-number inequality summary a
    // capacity/abuse dashboard tracks. Integer sums + one rounded
    // division; a broadcast scalar frame, no driver math.
    QueryDef(
      "gini_concentration",
      Some("""
        WITH u AS (
          SELECT user_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY user_id
        ), ranked AS (
          SELECT cents,
                 CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rk
          FROM u
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               round(2.0 * SUM(CAST(rk * cents AS BIGINT)) / (COUNT(*) * SUM(CAST(cents AS BIGINT)))
                     - (COUNT(*) + 1.0) / COUNT(*), 4) AS gini
        FROM ranked
      """.stripMargin.trim),
      (spark, dir) => {
        val u = Tables.events(spark, dir)
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        // r10: global rank via the two-phase GlobalRank operator, NOT
        // row_number() over an unpartitioned window — that plan funnels
        // every user through ONE task (caught by the partitionless-window
        // audit; the small OUTPUT had let it pass the orderedSmall guard)
        val ranked = graft.operators.GlobalRank
          .withGlobalRank(u, "rk", Seq(col("cents"), col("user_id")))
        ranked.agg(
          count(lit(1)).as("n_users"),
          sum(col("cents")).as("total_cents"),
          round(lit(2.0) * sum(col("rk") * col("cents")) /
            (count(lit(1)) * sum(col("cents"))) -
            (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"))
      }),

    // Per-key mode (most frequent category) with a deterministic
    // tie-break — the label-summarization primitive `max_by` alone can't
    // express deterministically when counts tie. One hash-agg + one
    // bounded per-key window.
    QueryDef(
      "mode_event_type",
      Some("""
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY user_id, event_type
        ), r AS (
          SELECT user_id, event_type, cnt,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY cnt DESC, event_type) AS rn
          FROM c
        )
        SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS cnt
        FROM r WHERE rn = 1
        ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.events(spark, dir)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type"))
        graft.Tails.orderedSmall(
          c.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("user_id"), col("event_type").as("mode_type"),
              col("cnt").cast("long").as("cnt")),
          col("user_id"))
      }),

    // weekday × hour activity heatmap — the load-shape rollup behind
    // capacity planning and anomaly baselines; one hash-agg, 168 output
    // cells at any scale. Weekday is Monday=0 in both engines.
    QueryDef(
      "activity_heatmap",
      Some("""
        SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hr,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY CAST(isodow(ts) - 1 AS BIGINT), CAST(hour(ts) AS BIGINT)
        ORDER BY dow, hr
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.events(spark, dir)
          .groupBy(
            weekday(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("cents"))
          .orderBy("dow", "hr")
      }),

    // Join-key skew diagnostics — the report that DECIDES whether a key
    // needs salting (skew_join_salted) before the join ships: hottest
    // keys with their multiple-of-mean factor and row share. One
    // hash-agg on the key + a broadcast 1-row stats frame; the report is
    // top-k sized at any fact scale.
    QueryDef(
      "skew_diagnostics",
      Some("""
        WITH k AS (
          SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        ), s AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, round(AVG(cnt), 4) AS avg_cnt
          FROM k
        ), top AS (
          SELECT user_id, cnt FROM k ORDER BY cnt DESC, user_id LIMIT 10
        )
        SELECT t.user_id, CAST(t.cnt AS BIGINT) AS cnt,
               round(t.cnt / s.avg_cnt, 4) AS skew_factor,
               round(CAST(t.cnt AS DOUBLE) / s.n_rows, 4) AS share
        FROM top t CROSS JOIN s
        ORDER BY cnt DESC, t.user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val k = Tables.events(spark, dir)
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        val s = k.agg(
          sum(col("cnt")).cast("long").as("n_rows"),
          round(avg(col("cnt")), 4).as("avg_cnt"))
        // top-10 with a total-order tiebreak: orderBy().limit() plans
        // TakeOrderedAndProject — per-partition heaps, no single task
        // ever sees more than 10 rows. The previous row_number() over a
        // PARTITIONLESS window serialized every distinct user through
        // one task (r15 verdict): at 100 TB that population is ~10⁹
        // rows, and this is the very report that decides whether a key
        // needs salting.
        val top = k.orderBy(col("cnt").desc, col("user_id")).limit(10)
        graft.Tails.orderedSmall(
          top.crossJoin(broadcast(s))
            .select(
              col("user_id"), col("cnt").cast("long").as("cnt"),
              round(col("cnt") / col("avg_cnt"), 4).as("skew_factor"),
              round(col("cnt").cast("double") / col("n_rows"), 4).as("share")),
          col("cnt").desc, col("user_id"))
      }),

    // Equi-width feature binning with DATA-DERIVED bounds: one scalar
    // min/max aggregate broadcast back over the fact scan (two passes
    // total — the bounds row is a broadcast nested-loop join against a
    // 1-row side, never a shuffle). The bin formula is written with
    // identical double ops in both engines instead of width_bucket, so
    // edge placement is bit-identical; max lands in the top bin by the
    // explicit hi-clamp, the one case the open upper edge would miss.
    QueryDef(
      "feature_binning",
      Some("""
        WITH b AS (
          SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
        )
        SELECT CASE WHEN l_extendedprice = b.hi THEN CAST(20 AS BIGINT)
                    ELSE CAST(floor((l_extendedprice - b.lo) * 20.0 / (b.hi - b.lo)) AS BIGINT) + 1 END AS bin,
               COUNT(*) AS n,
               round(min(l_extendedprice), 4) AS lo_v,
               round(max(l_extendedprice), 4) AS hi_v
        FROM lineitem, b
        GROUP BY 1
        ORDER BY bin
      """.stripMargin.trim),
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
        val b = li.agg(
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        graft.Tails.orderedSmall(
          li.crossJoin(broadcast(b))
            .withColumn("bin",
              when(col("l_extendedprice") === col("hi"), lit(20L))
                .otherwise(floor((col("l_extendedprice") - col("lo")) * 20.0 /
                  (col("hi") - col("lo"))).cast("long") + 1))
            .groupBy("bin")
            .agg(
              count(lit(1)).as("n"),
              round(min(col("l_extendedprice")), 4).as("lo_v"),
              round(max(col("l_extendedprice")), 4).as("hi_v")),
          col("bin"))
      })
  )
}
