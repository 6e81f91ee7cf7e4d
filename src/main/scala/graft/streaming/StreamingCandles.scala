package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the reference's incremental semantics
  * (SURVEY.md §2.11): the reference is a batch program that SIMULATES a
  * stream — files replayed in order, day-boundary candle flushes, running
  * company registration. Here the same semantics are declared once and run
  * identically in batch or streaming.
  */
object StreamingCandles {

  /** T2 day-boundary close: tumbling 1-day event-time window per key with
    * a 1-day watermark. In append mode a candle is emitted exactly when
    * its day closes — the reference's `process_daystocks` flush
    * (`etl/etl.py:672-676`). Late data beyond the watermark is dropped
    * (the reference would emit a duplicate candle — T5; documented
    * improvement).
    */
  def dailyCandles(ticks: DataFrame, key: String, ts: String, value: String): DataFrame =
    ticks
      .withWatermark(ts, "1 day")
      .groupBy(window(col(ts), "1 day").as("w"), col(key))
      .agg(
        min_by(col(value), col(ts)).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), col(ts)).as("close"),
        count(lit(1)).as("volume"),
        sum(col(value)).as("turnover"))
      .select(
        to_date(col("w.start")).as("day"), col(key),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("turnover"))

  /** T4 stateful entity registration: first time a key is seen, emit a
    * registration row; afterwards stay silent. `flatMapGroupsWithState`
    * keyed by the entity key — the streaming analog of the reference's
    * `companies_save` dict carried across files (`etl/etl.py:113-123,
    * 259-306`). Ids here are the stable entity key itself (dense ids
    * don't distribute; SURVEY.md §7.4 item 1).
    */
  case class Registration(key: String, firstSeen: java.sql.Timestamp)

  def registerNewKeys(
      keyed: Dataset[(String, java.sql.Timestamp)]): Dataset[Registration] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, Registration](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2.getTime)
            Iterator(Registration(key, first._2))
          }
      }
  }

  /** T1/T3 file replay: event-time-ordered file source with bounded files
    * per micro-batch (the reference's 100k-row commit batches,
    * `etl/etl.py:617`).
    */
  def fileStream(spark: SparkSession, dir: String, schemaOf: DataFrame, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schemaOf.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}
