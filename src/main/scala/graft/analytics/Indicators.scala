package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic indicators (SURVEY.md §2.5): rolling-window Bollinger bands
  * (reference `dashboard/tabs/tab1.py:15-21`) and per-row horizontal stats
  * (`dashboard/tabs/tab2.py:123-124`).
  */
object Indicators {

  /** Rolling mean/std Bollinger bands over the previous `n` rows per key.
    * Matches pandas `rolling(window=n)` semantics: null until the frame
    * holds exactly `n` rows (min_periods = window). `stddev` is sample
    * std (ddof=1) in both pandas and Spark.
    *
    * One window spec → one shuffle on `key`; the rows-frame is computed
    * in a single sorted pass per partition.
    */
  def bollinger(
      df: DataFrame,
      key: String,
      ts: String,
      close: String,
      n: Int = 20,
      numStd: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts)).rowsBetween(-(n - 1), 0)
    val full = count(lit(1)).over(w) === n
    val mid = when(full, avg(col(close)).over(w))
    val sd  = when(full, stddev(col(close)).over(w))
    df.withColumn("bb_mid", mid)
      .withColumn("bb_std", sd)
      .withColumn("bb_upper", col("bb_mid") + lit(numStd) * col("bb_std"))
      .withColumn("bb_lower", col("bb_mid") - lit(numStd) * col("bb_std"))
  }

  /** Horizontal (per-row) mean of the four OHLC columns
    * (`dashboard/tabs/tab2.py:123`).
    */
  def rowMean4(a: Column, b: Column, c: Column, d: Column): Column =
    (a + b + c + d) / 4

  /** Horizontal sample std (ddof=1, pandas `std(axis=1)`) of four columns —
    * closed form: sqrt(Σ(x-μ)² / 3). NOT Spark's column-wise stddev
    * (SURVEY.md §7.4 item 4).
    */
  def rowStd4(a: Column, b: Column, c: Column, d: Column): Column = {
    val m = rowMean4(a, b, c, d)
    sqrt(((a - m) * (a - m) + (b - m) * (b - m) + (c - m) * (c - m) + (d - m) * (d - m)) / 3)
  }
}
