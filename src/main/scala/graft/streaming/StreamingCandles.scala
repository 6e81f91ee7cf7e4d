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
  def dailyCandles(ticks: DataFrame, key: String, ts: String, value: String,
                   priceScale: Long = 100L): DataFrame =
    ticks
      .withWatermark(ts, "1 day")
      .groupBy(window(col(ts), "1 day").as("w"), col(key))
      .agg(
        min_by(col(value), col(ts)).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), col(ts)).as("close"),
        count(lit(1)).as("volume"),
        // exact fixed-point turnover (Candles' priceScale contract):
        // stateful partial sums of integer units never drift
        (sum(graft.etl.Candles.priceUnits(col(value), priceScale)).cast("double") / priceScale)
          .as("turnover"))
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

  /** Streaming tick compression: per-key state = (last emitted-or-seen
    * value, current day, last tick), batch rows sorted by event time
    * inside each group (micro-batches deliver rows unordered). Keeps the
    * batch operator's semantics for in-order day arrival: first/last of
    * day and >0.1% moves are emitted, interior small moves are dropped.
    * State per key is O(1) — three numbers — so millions of keys fit
    * trivially; contrast with the batch variant which needs no state but
    * a per-(key, day) sort.
    */
  case class TickEvent(key: Long, tsMicros: Long, value: Double)
  case class CompressState(lastValue: Double, lastDay: Long, lastTs: Long, lastEmittedTs: Long)

  def compressStream(ticks: Dataset[TickEvent], minChangePct: Double = 0.001): Dataset[TickEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.key)
      .flatMapGroupsWithState[CompressState, TickEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[CompressState]) =>
          val sorted = rows.toSeq.sortBy(_.tsMicros)
          val out = Seq.newBuilder[TickEvent]
          var st = state.getOption.getOrElse(CompressState(Double.NaN, Long.MinValue, Long.MinValue, Long.MinValue))
          sorted.foreach { t =>
            val day = Math.floorDiv(t.tsMicros, 86400000000L)
            val firstOfKey = st.lastTs == Long.MinValue
            val firstOfDay = day != st.lastDay
            val pct =
              if (firstOfKey || st.lastValue == 0.0) Double.NaN
              else math.abs(t.value - st.lastValue) / math.abs(st.lastValue)
            val keep = firstOfKey || firstOfDay || (!pct.isNaN && pct > minChangePct)
            if (firstOfDay && !firstOfKey && st.lastEmittedTs != st.lastTs)
              out += TickEvent(key, st.lastTs, st.lastValue) // close prior day late
            if (keep) out += t
            st = CompressState(t.value, day, t.tsMicros,
              if (keep) t.tsMicros else st.lastEmittedTs)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** T3 micro-batch warehouse sink: each appended micro-batch of closed
    * candles lands in the day-partitioned Parquet warehouse — the
    * `foreachBatch` analog of the reference's threshold-triggered bulk
    * COPY commits (`etl/etl.py:690-693`, `etl/timescaledb_model.py:29-57`).
    *
    * Idempotence: foreachBatch is at-least-once — a micro-batch that dies
    * after a partial write is REPLAYED under the same batchId, so a plain
    * `mode(append)` would duplicate rows. Each batch therefore overwrites
    * its own `batch=<id>` partition: the replay rewrites exactly the rows
    * the failed attempt wrote, never touching other batches' output —
    * effectively-once without a transactional table format. Readers see
    * one extra `batch` partition column (provenance) on top of `day`.
    */
  /** One micro-batch's write: overwrite of the batch's OWN `batch=<id>`
    * partition. Public so specs can replay a batchId through the exact
    * write path the sink uses and assert no duplicate rows survive.
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode("overwrite").partitionBy("day")
      .parquet(s"$path/batch=$batchId")

  def warehouseSink(
      candles: DataFrame,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    candles.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, path, batchId)
      }
      .start()

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
