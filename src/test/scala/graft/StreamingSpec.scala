package graft

import graft.etl.Candles
import graft.streaming.StreamingCandles
import org.apache.spark.sql.functions._

/** Streaming semantics = batch semantics on the same data (SURVEY.md
  * §2.11): the candle a streaming day-close emits must equal the batch
  * aggregation's candle.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming daily candles equal batch candles (complete mode replay)") {
    val batchDf = Tables.events(spark, sf).select("user_id", "ts", "value")
    // file source needs a directory — stage the single parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = StreamingCandles.fileStream(
      spark, streamDir.toString, Tables.load(spark, sf, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("user_id", "ts", "value")

    val q = StreamingCandles.dailyCandles(stream, "user_id", "ts", "value")
      .writeStream.format("memory").queryName("candles_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("candles_stream")
      val batch = Candles.ohlcvDaily(batchDf, "user_id", "ts", "value")
        .select($"day", $"user_id", $"open", $"high", $"low", $"close", $"volume", $"turnover")
      assert(streamed.count() == batch.count())
      val mismatched = streamed.join(batch,
        Seq("day", "user_id", "open", "high", "low", "close", "volume"), "left_anti")
      assert(mismatched.count() == 0)
    } finally q.stop()
  }

  test("append-mode replay: candles emit exactly when the watermark closes their day") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select("user_id", "ts", "value").cache()
    // three chronological chunks → three micro-batches (maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("graft-replay")
    val chunks = Seq(
      ev.filter(to_date($"ts") < "2024-01-11"),
      ev.filter(to_date($"ts") >= "2024-01-11" && to_date($"ts") < "2024-01-21"),
      ev.filter(to_date($"ts") >= "2024-01-21"))
    chunks.zipWithIndex.foreach { case (c, i) =>
      val f = dir.resolve(s"chunk$i")
      c.coalesce(1).write.parquet(f.toString)
      // file-source batch order follows modification time
      f.toFile.listFiles().foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
    val q = StreamingCandles.dailyCandles(stream, "user_id", "ts", "value")
      .writeStream.format("memory").queryName("replay_candles")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("replay_candles")
      // append emits a window once the watermark (max event time − 1 day)
      // passes its end; after the last data batch the engine runs a final
      // state-flush batch, so the effective watermark is maxTs(ALL data)
      // − 1 day — only the still-open trailing day(s) stay unemitted
      val cutoff = ev.agg(max($"ts")).collect()(0).getTimestamp(0).toInstant
        .minusSeconds(86400)
      val expected = Candles.ohlcvDaily(ev, "user_id", "ts", "value")
        .filter(col("day").cast("timestamp") + expr("INTERVAL 1 DAY") <=
          lit(java.sql.Timestamp.from(cutoff)))
      assert(emitted.count() == expected.count())
      assert(emitted.join(expected,
        Seq("day", "user_id", "open", "high", "low", "close", "volume"), "left_anti").count() == 0)
    } finally q.stop()
  }

  test("streaming session windows equal batch sessionization for watermark-closed sessions") {
    val ev = Tables.events(spark, sf).select("user_id", "ts", "value")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sess-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = StreamingCandles.fileStream(
      spark, streamDir.toString, Tables.load(spark, sf, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("user_id", "ts", "value")
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(min($"ts").as("session_start"), max($"ts").as("last_ts"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "last_ts", "n_events")
    val q = sessions(stream.withWatermark("ts", "1 minute"))
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("sessions_stream")
      // append emits a session once the watermark (max event time − 1 min,
      // after the final state-flush batch) passes its close (last_ts +
      // 30-min gap); only trailing still-open sessions stay unemitted
      val cutoff = ev.agg(max($"ts")).collect()(0).getTimestamp(0).toInstant
        .minusSeconds(60)
      val expected = sessions(ev)
        .filter($"last_ts" + expr("INTERVAL 30 MINUTES") <=
          lit(java.sql.Timestamp.from(cutoff)))
      assert(emitted.count() == expected.count())
      assert(emitted.join(expected,
        Seq("user_id", "session_start", "last_ts", "n_events"), "left_anti").count() == 0)
      assert(emitted.count() > 0)
    } finally q.stop()
  }

  test("foreachBatch warehouse sink: emitted candles land day-partitioned in parquet") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select("user_id", "ts", "value")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sink-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = StreamingCandles.fileStream(
      spark, streamDir.toString, Tables.load(spark, sf, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("user_id", "ts", "value")
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out")
    val q = StreamingCandles.warehouseSink(
      StreamingCandles.dailyCandles(stream, "user_id", "ts", "value"),
      out.resolve("daystocks").toString,
      out.resolve("ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    val warehouse = spark.read.parquet(out.resolve("daystocks").toString)
    val cutoff = ev.agg(max($"ts")).collect()(0).getTimestamp(0).toInstant.minusSeconds(86400)
    val expected = Candles.ohlcvDaily(ev, "user_id", "ts", "value")
      .filter(col("day").cast("timestamp") + expr("INTERVAL 1 DAY") <=
        lit(java.sql.Timestamp.from(cutoff)))
    assert(warehouse.count() == expected.count())
    assert(warehouse.select("day").distinct().count() > 20) // partitioned by day
  }

  test("stream-static join: each micro-batch enriched against a batch dimension") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts", "value")
    val dim = ev.select($"user_id").distinct()
      .withColumn("cohort", pmod($"user_id", lit(3)))
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssj-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = StreamingCandles.fileStream(
      spark, streamDir.toString, Tables.load(spark, sf, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("event_id", "user_id", "ts", "value")
    // stateless stream-static equi-join: the static side is re-planned
    // per micro-batch (picking up dimension updates), the stream side
    // needs no state — the standard enrichment shape
    val q = stream.join(broadcast(dim), "user_id")
      .writeStream.format("memory").queryName("ssj_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("ssj_stream")
      val batch = ev.join(dim, "user_id")
      assert(emitted.count() == batch.count())
      assert(emitted.select("event_id", "cohort")
        .join(batch.select("event_id", "cohort"),
          Seq("event_id", "cohort"), "left_anti").count() == 0)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events") {
    import org.apache.spark.sql.functions._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-dup-src")
    val ev = Tables.events(spark, sf).select("event_id", "ts", "user_id", "value").limit(200)
    // the same events twice = an at-least-once source replay
    ev.unionByName(ev).coalesce(1).write.parquet(srcDir.resolve("dup").toString)
    val stream = spark.readStream
      .schema(ev.schema)
      .parquet(srcDir.toString + "/*")
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 200)
    } finally q.stop()
  }

  test("stateful registration emits each key exactly once with first-seen time") {
    val input = Seq(
      ("AAA", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("AAA", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")),
      ("BBB", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))).toDS()
    val regs = StreamingCandles.registerNewKeys(input).collect()
    assert(regs.map(_.key).sorted.toSeq == Seq("AAA", "BBB"))
    assert(regs.find(_.key == "AAA").get.firstSeen ==
      java.sql.Timestamp.valueOf("2024-01-01 09:00:00"))
  }
}
