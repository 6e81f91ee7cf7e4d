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
