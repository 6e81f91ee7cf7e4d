package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Daily OHLCV candle aggregation — the reference's core aggregate
  * (`etl/etl.py:349-364` groupby first/last/max/min/sum and the
  * dashboard resample `dashboard/timescaledb_model.py:557-572`).
  *
  * Spark-first: one hash aggregate keyed on (key, day). `min_by`/`max_by`
  * on the event time make open/close deterministic without relying on
  * input order (the reference sorts files chronologically and uses
  * positional first/last; at 100 TB there is no global order to rely on).
  * Partial aggregation (map-side combine) is automatic; the only shuffle
  * is on the group key, which at scale is high-cardinality (key × day) and
  * therefore well distributed.
  *
  * Turnover is an EXACT fixed-point sum: exchange prices are decimals on
  * a known grid (`priceScale` units per 1.0 — cents by default), and
  * summing them as floats makes the result depend on partial-aggregation
  * order in the last ulp, which flips rounded digits at scale (the
  * interval_join_agg sf1 find). Each price is quantized to integer units
  * once, the units sum exactly in any order, and one final division
  * emits the double — identical in every engine and at every
  * partitioning.
  */
object Candles {

  /** Integer price units: v is a double on the 1/scale grid, so v*scale
    * is within float-representation error of an integer and round() is
    * deterministic in both engines.
    */
  private[graft] def priceUnits(v: Column, scale: Long): Column =
    round(v * scale).cast("long")

  /** Per-(key, day) OHLCV candle. `mean = (o+h+l+c)/4` mirrors
    * `etl/etl.py:364`.
    */
  def ohlcvDaily(ticks: DataFrame, key: String, ts: String, value: String,
                 priceScale: Long = 100L): DataFrame = {
    val k = col(key)
    val t = col(ts)
    val v = col(value)
    ticks
      .groupBy(k, to_date(t).as("day"))
      .agg(
        min_by(v, t).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, t).as("close"),
        count(lit(1)).as("volume"),
        (sum(priceUnits(v, priceScale)).cast("double") / priceScale).as("turnover"))
      .withColumn("mean", (col("open") + col("high") + col("low") + col("close")) / 4)
  }

  /** MERGEABLE per-(key, day) candle state — the continuous-aggregate
    * analog (the reference's TimescaleDB would maintain this as a
    * materialized daily rollup refreshed as ticks land). Unlike
    * `ohlcvDaily`'s finished candle, the state carries `first_ts` /
    * `last_ts`, which makes two states over DISJOINT tick sets merge
    * exactly: open follows the earlier first_ts, close the later
    * last_ts, and high/low/volume/turnover are associative. A 100 TB
    * warehouse refreshes only the (key, day) groups a new batch touches —
    * history is never rescanned (`mergeCandleStates` + the
    * day-partitioned upsert give the partition-scoped write).
    */
  def candleState(ticks: DataFrame, key: String, ts: String, value: String,
                  priceScale: Long = 100L): DataFrame = {
    val k = col(key)
    val t = col(ts)
    val v = col(value)
    // state carries turnover in INTEGER units (`turnover_units`) so that
    // merges stay exact at any fold order; finishCandles divides once
    ticks.groupBy(k, to_date(t).as("day"))
      .agg(
        min(t).as("first_ts"), min_by(v, t).as("open"),
        max(v).as("high"), min(v).as("low"),
        max(t).as("last_ts"), max_by(v, t).as("close"),
        count(lit(1)).as("volume"), sum(priceUnits(v, priceScale)).as("turnover_units"))
  }

  /** Merge candle states over disjoint tick sets (same schema in, same
    * schema out; associative and commutative — fold in any order).
    * Deterministic when event times are unique per key, the same
    * assumption `ohlcvDaily`'s min_by/max_by already make.
    */
  def mergeCandleStates(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(key), col("day"))
      .agg(
        min(col("first_ts")).as("first_ts"),
        min_by(col("open"), col("first_ts")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max(col("last_ts")).as("last_ts"),
        max_by(col("close"), col("last_ts")).as("close"),
        sum(col("volume")).as("volume"), sum(col("turnover_units")).as("turnover_units"))

  /** Finish a candle state into the `ohlcvDaily` output shape. */
  def finishCandles(state: DataFrame, priceScale: Long = 100L): DataFrame =
    state
      .drop("first_ts", "last_ts")
      .withColumn("turnover", col("turnover_units").cast("double") / priceScale)
      .drop("turnover_units")
      .withColumn("mean", (col("open") + col("high") + col("low") + col("close")) / 4)

  /** Whole-table daily resample (dashboard fallback path A3/A4):
    * first/max/min/last/avg/volume per calendar day, all keys merged.
    */
  def resampleDaily(ticks: DataFrame, ts: String, value: String,
                    priceScale: Long = 100L): DataFrame = {
    val t = col(ts)
    val v = col(value)
    ticks
      .groupBy(to_date(t).as("day"))
      .agg(
        min_by(v, t).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, t).as("close"),
        // exact fixed-point mean: integer-units sum, two divisions of
        // identical operands — order-independent like turnover
        (sum(priceUnits(v, priceScale)).cast("double") / priceScale / count(lit(1)))
          .as("mean_value"),
        count(lit(1)).as("volume"))
  }
}
