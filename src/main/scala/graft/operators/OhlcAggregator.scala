package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One tick (typed view of the events table). */
case class Tick(user_id: Long, tsMicros: Long, value: Double)

/** Single-pass OHLC accumulation state. Open/close track the extreme of
  * the TOTAL order (ts, value) — min for open, max for close — so merge()
  * of partial buffers from any partitioning yields the same candle even
  * when several ticks share a timestamp: the property that lets Spark run
  * it as partial + final aggregation at any scale. (With strict
  * ts-only comparisons, equal-ts ticks in different partial buffers made
  * open/close depend on merge order.)
  */
case class OhlcBuf(
    firstTs: Long, open: Double,
    lastTs: Long, close: Double,
    high: Double, low: Double,
    n: Long, sumUnits: Long)

/** Typed single-pass OHLCV aggregator (SURVEY.md §7.3 optional showcase):
  * computes open/high/low/close/volume/turnover in ONE traversal instead
  * of six separate aggregate expressions. Semantically equal to
  * `Candles.ohlcvDaily` (checked against the same DuckDB oracle).
  * Turnover accumulates in integer price units (`priceScale` per 1.0 —
  * Candles' fixed-point contract), so partial/final merge order cannot
  * drift the sum.
  */
class OhlcAggregator(priceScale: Long = 100L) extends Aggregator[Tick, OhlcBuf, OhlcBuf] {

  override def zero: OhlcBuf =
    OhlcBuf(Long.MaxValue, 0.0, Long.MinValue, 0.0,
      Double.NegativeInfinity, Double.PositiveInfinity, 0L, 0L)

  override def reduce(b: OhlcBuf, t: Tick): OhlcBuf = {
    val tFirst = b.n == 0 ||
      t.tsMicros < b.firstTs || (t.tsMicros == b.firstTs && t.value < b.open)
    val tLast = b.n == 0 ||
      t.tsMicros > b.lastTs || (t.tsMicros == b.lastTs && t.value > b.close)
    OhlcBuf(
      if (tFirst) t.tsMicros else b.firstTs,
      if (tFirst) t.value else b.open,
      if (tLast) t.tsMicros else b.lastTs,
      if (tLast) t.value else b.close,
      math.max(b.high, t.value),
      math.min(b.low, t.value),
      b.n + 1,
      b.sumUnits + roundHalfUp(t.value * priceScale))
  }

  /** HALF_UP (away from zero), matching Spark's `round()` used by
    * `Candles.priceUnits` — `Math.round` alone is half-toward-positive-
    * infinity, which diverges for negative values landing exactly on a
    * half-unit (off the declared price grid). Branch, not BigDecimal:
    * this runs per row in the typed hot path.
    */
  private def roundHalfUp(x: Double): Long =
    if (x >= 0) Math.round(x) else -Math.round(-x)

  override def merge(a: OhlcBuf, b: OhlcBuf): OhlcBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val aFirst = a.firstTs < b.firstTs || (a.firstTs == b.firstTs && a.open <= b.open)
    val aLast = a.lastTs > b.lastTs || (a.lastTs == b.lastTs && a.close >= b.close)
    OhlcBuf(
      if (aFirst) a.firstTs else b.firstTs,
      if (aFirst) a.open else b.open,
      if (aLast) a.lastTs else b.lastTs,
      if (aLast) a.close else b.close,
      math.max(a.high, b.high),
      math.min(a.low, b.low),
      a.n + b.n,
      a.sumUnits + b.sumUnits)
  }

  override def finish(r: OhlcBuf): OhlcBuf = r
  override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
  override def outputEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
}

object OhlcAggregator {

  /** Daily candles through the typed aggregator; output schema matches
    * `Candles.ohlcvDaily`, including the exact fixed-point turnover
    * (integer units accumulated, one final division — no float-sum
    * order dependence).
    */
  def dailyCandles(ticks: DataFrame, key: String, ts: String, value: String,
                   priceScale: Long = 100L): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    // a tick without a key, a time, or a price is not a tick — dropped by
    // contract (a null in the typed Tick encoder is a hard
    // NOT_NULL_ASSERT_VIOLATION, not a skipped value; gauntlet finding)
    val typed = ticks
      .filter(col(key).isNotNull && col(ts).isNotNull && col(value).isNotNull)
      .select(
        col(key).cast("long").as("user_id"),
        unix_micros(col(ts)).as("tsMicros"),
        col(value).cast("double").as("value")).as[Tick]
    typed
      .groupByKey(t => (t.user_id, Math.floorDiv(t.tsMicros, 86400000000L)))
      .agg(new OhlcAggregator(priceScale).toColumn.name("c"))
      .map { case ((uid, epochDay), c) =>
        (uid, java.time.LocalDate.ofEpochDay(epochDay).toString,
          c.open, c.high, c.low, c.close, c.n, c.sumUnits.toDouble / priceScale)
      }
      .toDF(key, "day_s", "open", "high", "low", "close", "volume", "turnover")
      .withColumn("day", to_date(col("day_s"))).drop("day_s")
      .withColumn("mean", (col("open") + col("high") + col("low") + col("close")) / 4)
  }
}
