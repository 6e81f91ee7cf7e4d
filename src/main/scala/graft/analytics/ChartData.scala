package graft.analytics

import graft.etl.Candles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dashboard chart read path (SURVEY.md §3.2, reference
  * `dashboard/timescaledb_model.py:506-583`): serve candles from the
  * precomputed daily table when the range has them, FALL BACK to
  * aggregating raw ticks on the fly when it doesn't (the reference's
  * daystocks-then-stocks coalesce).
  *
  * Declarative fallback: both branches are computed lazily and combined
  * with an anti-join — days present in the candle table win, days missing
  * from it are filled from ticks. No driver-side "is it empty?" round
  * trip, so the plan stays a single DAG and Catalyst prunes both scans to
  * the requested key + range.
  */
object ChartData {

  def candlesWithFallback(
      dayTable: DataFrame, // (key, day, open, high, low, close, volume)
      ticks: DataFrame,    // (key, ts, value)
      key: String,
      startDay: String,
      endDay: String): DataFrame = {
    val inRange = dayTable
      .filter(col("day").between(lit(startDay), lit(endDay)))
    val fallback = Candles
      .ohlcvDaily(
        ticks.filter(to_date(col("ts")).between(lit(startDay), lit(endDay))),
        key, "ts", "value")
      .select(col(key), col("day"), col("open"), col("high"), col("low"),
        col("close"), col("volume"))
      .join(inRange.select(col(key), col("day")), Seq(key, "day"), "left_anti")
    inRange
      .select(col(key), col("day"), col("open"), col("high"), col("low"),
        col("close"), col("volume"))
      .unionByName(fallback)
  }
}
