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
  */
object Candles {

  /** Per-(key, day) OHLCV candle. `mean = (o+h+l+c)/4` mirrors
    * `etl/etl.py:364`.
    */
  def ohlcvDaily(ticks: DataFrame, key: String, ts: String, value: String): DataFrame = {
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
        sum(v).as("turnover"))
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
  def candleState(ticks: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val k = col(key)
    val t = col(ts)
    val v = col(value)
    ticks.groupBy(k, to_date(t).as("day"))
      .agg(
        min(t).as("first_ts"), min_by(v, t).as("open"),
        max(v).as("high"), min(v).as("low"),
        max(t).as("last_ts"), max_by(v, t).as("close"),
        count(lit(1)).as("volume"), sum(v).as("turnover"))
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
        sum(col("volume")).as("volume"), sum(col("turnover")).as("turnover"))

  /** Finish a candle state into the `ohlcvDaily` output shape. */
  def finishCandles(state: DataFrame): DataFrame =
    state
      .drop("first_ts", "last_ts")
      .withColumn("mean", (col("open") + col("high") + col("low") + col("close")) / 4)

  /** Whole-table daily resample (dashboard fallback path A3/A4):
    * first/max/min/last/avg/volume per calendar day, all keys merged.
    */
  def resampleDaily(ticks: DataFrame, ts: String, value: String): DataFrame = {
    val t = col(ts)
    val v = col(value)
    ticks
      .groupBy(to_date(t).as("day"))
      .agg(
        min_by(v, t).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, t).as("close"),
        avg(v).as("mean_value"),
        count(lit(1)).as("volume"))
  }
}
