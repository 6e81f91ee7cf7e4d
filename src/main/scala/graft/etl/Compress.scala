package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tick-stream compression (reference `clean_stocks`, `etl/etl.py:372-413`,
  * W1–W5): keep a quote iff it moved > `minChangePct` vs the previous quote
  * of the same key, or it is the first/last quote of a (key, day) or of the
  * key overall.
  *
  * Scale design: ALL five keep-signals derive from ONE window
  * `partitionBy(key).orderBy(ts)` — boundaries are detected with lag/lead
  * of the day instead of a second (key, day) window, so the whole operator
  * costs exactly one shuffle + one sort regardless of data size. The
  * reference needs a stable mergesort and five sequential passes
  * (`etl/etl.py:382-410`); here the sort is the window's own and the mask
  * is a single codegen'd projection.
  */
object Compress {

  def tickCompression(
      ticks: DataFrame,
      key: String,
      ts: String,
      value: String,
      minChangePct: Double = 0.001): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val day = to_date(col(ts))

    val withSignals = ticks
      .withColumn("_prev", lag(col(value), 1).over(w))
      .withColumn("_prev_day", lag(day, 1).over(w))
      .withColumn("_next_day", lead(day, 1).over(w))

    // pct change with null-safe denominator: |v - prev| / nullif(|prev|, 0)
    // (`etl/etl.py:388-390`; division by zero must yield null, not Inf).
    val pct = abs(col(value) - col("_prev")) /
      when(abs(col("_prev")) === 0, lit(null)).otherwise(abs(col("_prev")))

    val firstOfKey = col("_prev").isNull
    val lastOfKey  = col("_next_day").isNull
    val firstOfDay = col("_prev_day").isNull || col("_prev_day") =!= day
    val lastOfDay  = col("_next_day").isNull || col("_next_day") =!= day
    val hasChange  = coalesce(pct > minChangePct, lit(false))

    withSignals
      .filter(hasChange || firstOfDay || lastOfDay || firstOfKey || lastOfKey)
      .drop("_prev", "_prev_day", "_next_day")
  }

  /** Scale-out variant: identical semantics, but windows partition by
    * (key, DAY) instead of key alone. With few entities and deep history
    * (the 100 TB shape: ~thousands of symbols × years of ticks), a
    * key-partitioned window forces one task to sort a key's ENTIRE
    * history; (key, day) bounds every task to one day of one key. The
    * only cross-day information needed is each day's closing value, which
    * is a tiny per-(key, day) aggregate handed to the next day via a
    * key-partitioned window over DAYS (cardinality keys×days, not ticks).
    */
  def tickCompressionScalable(
      ticks: DataFrame,
      key: String,
      ts: String,
      value: String,
      minChangePct: Double = 0.001): DataFrame = {
    val day = to_date(col(ts)).as("_day")
    val withDay = ticks.withColumn("_day", day)

    // per-(key, day) close; then previous existing day's close via a
    // window over the small day-level frame
    val dayWindow = Window.partitionBy(col(key)).orderBy(col("_day"))
    val dayCloses = withDay
      .groupBy(col(key), col("_day"))
      .agg(max_by(col(value), col(ts)).as("_day_close"))
      .withColumn("_prev_day_close", lag(col("_day_close"), 1).over(dayWindow))
      .withColumn("_is_first_day", lag(col("_day"), 1).over(dayWindow).isNull)
      .withColumn("_is_last_day", lead(col("_day"), 1).over(dayWindow).isNull)
      .drop("_day_close")

    val w = Window.partitionBy(col(key), col("_day")).orderBy(col(ts))
    val withSignals = withDay
      .withColumn("_prev_in_day", lag(col(value), 1).over(w))
      .withColumn("_rn_desc", row_number().over(
        Window.partitionBy(col(key), col("_day")).orderBy(col(ts).desc)))
      .join(dayCloses, Seq(key, "_day"))
      .withColumn("_prev", coalesce(col("_prev_in_day"), col("_prev_day_close")))

    val pct = abs(col(value) - col("_prev")) /
      when(abs(col("_prev")) === 0, lit(null)).otherwise(abs(col("_prev")))
    val firstOfDay = col("_prev_in_day").isNull
    val lastOfDay  = col("_rn_desc") === 1
    val firstOfKey = firstOfDay && col("_is_first_day")
    val lastOfKey  = lastOfDay && col("_is_last_day")
    val hasChange  = coalesce(pct > minChangePct, lit(false))

    withSignals
      .filter(hasChange || firstOfDay || lastOfDay || firstOfKey || lastOfKey)
      .drop("_day", "_prev_in_day", "_rn_desc", "_prev_day_close",
        "_is_first_day", "_is_last_day", "_prev")
  }
}
