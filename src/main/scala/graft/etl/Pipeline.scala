package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's end-to-end ETL flow (SURVEY.md §3.1) as ONE declarative
  * DAG: tick stream → junk filter → tick compression → daily OHLCV
  * candles → broadcast dimension enrichment.
  *
  * Reference equivalent: `process_boursorama_file` → `process_dataframe`
  * → `clean_stocks` → `process_daystocks` → `commit_*`
  * (`etl/etl.py:135-497`), which materializes pandas batches at every
  * step. Here Catalyst sees the whole pipeline at once (audited with
  * Explain): the value filter is pushed into the parquet scan, the three
  * compression windows share one Exchange+Sort on key, the candle
  * aggregation REUSES that partitioning (partial+final hash agg with no
  * further exchange), and the dimension join is a broadcast hash join —
  * ONE data shuffle end-to-end at any scale.
  */
object Pipeline {

  def dailyCandlesEnriched(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .filter(col("value") > 0) // junk filter (`etl/etl.py:196-197`)
    val compressed = Compress.tickCompression(ticks, "user_id", "ts", "value")
    val candles = Candles.ohlcvDaily(compressed, "user_id", "ts", "value")
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    candles
      .join(broadcast(dim), candles("user_id") === dim("c_custkey"), "left")
      .select(
        col("user_id"), col("day"), col("c_name"), col("c_mktsegment"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("turnover"),
        round(col("mean"), 4).as("mean"))
  }
}
