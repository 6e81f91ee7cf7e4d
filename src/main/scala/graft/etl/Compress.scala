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
}
