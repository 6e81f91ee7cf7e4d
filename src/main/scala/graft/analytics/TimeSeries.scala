package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series extensions beyond the reference's indicator set: calendar
  * gap-filling with forward-fill, bounded-window EWMA, and running-peak
  * drawdown. All are single-shuffle window/agg compositions — no driver
  * loops, no UDFs.
  */
object TimeSeries {

  /** Daily close per key on a COMPLETE calendar spine: missing days are
    * materialized (one row per key × day between that key's first and
    * last observation) and filled with the last prior close
    * (forward-fill / LOCF), flagged `is_gap`.
    *
    * Shape: one groupBy to the daily grain, a per-key min/max, a
    * `sequence()` explode to build the spine (rows ∝ key-count × span
    * days — never a global calendar cross join), a left join back on
    * (key, day), and one ordered window for the fill. All four stages
    * share the key as shuffle key; AQE coalesces the small spine side.
    *
    * CONTRACT: `value` must be non-null on observed rows — max_by's
    * null-element behavior differs between engines, so a null close
    * would diverge from the oracle. Non-null in the catalog's events;
    * caller obligation otherwise.
    */
  def gapFillDaily(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val daily = df
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(max_by(col(value), col(ts)).as("close"))
    val spine = daily
      .groupBy(col(key))
      .agg(min(col("day")).as("_mn"), max(col("day")).as("_mx"))
      .select(col(key), explode(sequence(col("_mn"), col("_mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq(key, "day"), "left")
      .withColumn("is_gap", col("close").isNull)
      .withColumn("filled", last(col("close"), ignoreNulls = true).over(w))
      .drop("close")
  }

  /** Linear interpolation of missing days on the calendar spine — the
    * numeric sibling of [[gapFillDaily]]'s LOCF: a gap day between two
    * observed anchors gets the straight-line value
    * `prev + (next − prev) · Δdays_prev / Δdays_span`; gaps before the
    * first / after the last anchor fall back to the nearest anchor
    * (pandas `interpolate(limit_direction='both')` semantics). Same
    * single-shuffle shape as gapFillDaily plus two bounded scans per key
    * (the IGNORE-NULLS window pair); determinism across engines comes
    * from stating the arithmetic identically — integer day deltas, one
    * multiply, one divide — and rounding at the caller.
    */
  def interpolateDaily(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val daily = df
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(max_by(col(value), col(ts)).as("close"))
    val spine = daily
      .groupBy(col(key))
      .agg(min(col("day")).as("_mn"), max(col("day")).as("_mx"))
      .select(col(key), explode(sequence(col("_mn"), col("_mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val back = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine
      .join(daily, Seq(key, "day"), "left")
      .withColumn("is_gap", col("close").isNull)
      .withColumn("prev_v", last(col("close"), ignoreNulls = true).over(back))
      .withColumn("prev_d", last(when(col("close").isNotNull, col("day")), ignoreNulls = true).over(back))
      .withColumn("next_v", first(col("close"), ignoreNulls = true).over(fwd))
      .withColumn("next_d", first(when(col("close").isNotNull, col("day")), ignoreNulls = true).over(fwd))
      .withColumn("interp",
        when(col("close").isNotNull, col("close"))
          .when(col("prev_v").isNull, col("next_v"))
          .when(col("next_v").isNull, col("prev_v"))
          .otherwise(col("prev_v") +
            (col("next_v") - col("prev_v")) *
              datediff(col("day"), col("prev_d")) /
              datediff(col("next_d"), col("prev_d"))))
      .drop("close", "prev_v", "prev_d", "next_v", "next_d")
  }

  /** Per-key autocorrelation at lags 1..3 over the daily-close series.
    * Pearson is computed from explicit pairwise-filtered moments with a
    * GUARDED post-aggregation division, not `corr(...)`: under Spark 4's
    * default ANSI mode, corr's internal division THROWS
    * DIVIDE_BY_ZERO on a zero-variance group (a constant series — think
    * a halted ticker), where SQL semantics (and the DuckDB oracle) say
    * NULL. Computing the three aggregates per lag and dividing inside a
    * CASE keeps the division unevaluated exactly when it is undefined.
    * covar_samp already ignores null pairs; the stddev of `close` needs
    * the explicit FILTER to share the pairwise basis.
    */
  def acfLags(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
    val daily = df
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(max_by(col(value), col(ts)).as("close"))
    val lagged = daily
      .withColumn("l1", lag(col("close"), 1).over(w))
      .withColumn("l2", lag(col("close"), 2).over(w))
      .withColumn("l3", lag(col("close"), 3).over(w))
    val lagMoments = (1 to 3).flatMap { k =>
      Seq(
        covar_samp(col("close"), col(s"l$k")).as(s"c$k"),
        expr(s"stddev_samp(close) FILTER (WHERE l$k IS NOT NULL)").as(s"s${k}a"),
        stddev_samp(col(s"l$k")).as(s"s${k}b"))
    }
    val m = lagged.groupBy(col(key))
      .agg(count(lit(1)).as("n_days"), lagMoments: _*)
    def acf(k: Int) = round(
      when(col(s"s${k}a") > 0 && col(s"s${k}b") > 0,
        col(s"c$k") / (col(s"s${k}a") * col(s"s${k}b"))), 4).as(s"acf$k")
    m.select(col(key), col("n_days"), acf(1), acf(2), acf(3))
  }

  /** Exponentially weighted moving average over a BOUNDED trailing window
    * (adjust=true form: weights (1−α)^j for the j-th most recent row,
    * normalized by their sum — pandas `ewm(alpha, adjust=True)` truncated
    * to `window` rows).
    *
    * The unbounded recurrence `e_n = α·x_n + (1−α)·e_{n−1}` is not
    * window-expressible without numerically explosive rescaling; the
    * bounded form is exact, partition-parallel, and at (1−α)^10 ≈ 0.03
    * the truncation tail is below a 4-decimal rounding anyway.
    * Implementation collects the frame into an array and folds a weighted
    * sum with higher-order functions — interpreted, not codegen'd, but
    * per-row cost is O(window) with zero shuffles beyond the window sort.
    *
    * CONTRACT: `value` must be non-null. Spark's collect_list silently
    * DROPS nulls from the frame (shifting the weights onto the surviving
    * rows) while DuckDB's list() keeps them — pre-filter nulls before
    * calling, or the engines diverge. The catalog's events.value is
    * non-null; this is a caller obligation, not a checked invariant.
    */
  def ewma(df: DataFrame, key: String, ts: String, value: String,
           alpha: Double, window: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rowsBetween(-(window - 1), Window.currentRow)
    val decay = 1.0 - alpha
    // frame order = orderBy order → lw is oldest..newest; element i
    // (0-based) of n gets weight decay^(n-1-i)
    df.withColumn("_lw", collect_list(col(value)).over(w))
      .withColumn("ewma", round(
        expr(s"""aggregate(transform(_lw, (x, i) -> x * pow($decay, size(_lw) - 1 - i)),
                           cast(0 as double), (a, x) -> a + x)""") /
          expr(s"""aggregate(transform(_lw, (x, i) -> pow($decay, size(_lw) - 1 - i)),
                             cast(0 as double), (a, x) -> a + x)"""), 4))
      .drop("_lw")
  }

  /** Running peak and drawdown-from-peak per key: peak = cumulative max
    * of `value` in time order; drawdown = (peak − value) / peak (null on
    * a zero peak). One window, one shuffle.
    */
  def drawdown(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("peak", max(col(value)).over(w))
      .withColumn("dd", round(
        (col("peak") - col(value)) /
          when(col("peak") === 0, lit(null)).otherwise(col("peak")), 4))
  }
}
