package graft

import graft.etl.Compress
import graft.operators.Skew
import graft.streaming.StreamingCandles
import graft.streaming.StreamingCandles.TickEvent
import org.apache.spark.sql.functions._

/** Scale-path operators: salted aggregation equivalence and streaming
  * compression vs the batch operator.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct groupBy (exact int sums)") {
    val df = Tables.events(spark, sf)
      .withColumn("cents", round($"value" * 100).cast("long"))
    val direct = df.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"cents").as("total"))
    val salted = Skew.saltedCountSum(df, "user_id", "cents", "event_id", nSalts = 16)
    assert(direct.count() == salted.count())
    assert(direct.join(salted, Seq("user_id", "n", "total"), "left_anti").count() == 0)
  }

  test("distributed prefix sum is partitioning-invariant and equals the global window") {
    import graft.operators.PrefixSum
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", size(split(lower(trim($"text")), "\\s+")).cast("long").as("n"))
    val viaWindow = toks
      .withColumn("start_off",
        coalesce(sum($"n").over(
          Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    for (parts <- Seq(1, 7, 32)) {
      val dist = PrefixSum.exclusivePrefixSum(toks, "doc_id", "n", nParts = parts)
      assert(dist.count() == viaWindow.count())
      assert(dist.join(viaWindow, Seq("doc_id", "n", "start_off"), "left_anti").count() == 0,
        s"mismatch at nParts=$parts")
    }
    // default width follows spark.sql.shuffle.partitions, result unchanged
    val auto = PrefixSum.exclusivePrefixSum(toks, "doc_id", "n")
    assert(auto.rdd.getNumPartitions == spark.sessionState.conf.numShufflePartitions)
    assert(auto.join(viaWindow, Seq("doc_id", "n", "start_off"), "left_anti").count() == 0)
  }

  test("streaming compression matches batch except each key's open final day") {
    val ticks = Tables.events(spark, sf).select("user_id", "ts", "value")
    val ds = ticks.select(
      $"user_id".as("key"),
      unix_micros($"ts").as("tsMicros"),
      $"value").as[TickEvent]
    val streamed = StreamingCandles.compressStream(ds)
      .toDF("user_id", "ts_us", "value")
    val batch = Compress.tickCompression(ticks, "user_id", "ts", "value")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")

    // everything the streaming operator emits, batch also keeps
    assert(streamed.join(batch, Seq("user_id", "ts_us", "value"), "left_anti").count() == 0)

    // batch-only rows are exactly final-day closers the stream hasn't
    // emitted yet (day still open at end of input)
    val batchOnly = batch.join(streamed, Seq("user_id", "ts_us", "value"), "left_anti")
    val lastPerKeyDay = ticks
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(max(unix_micros($"ts")).as("ts_us"))
    assert(batchOnly.join(lastPerKeyDay, Seq("user_id", "ts_us"), "left_anti").count() == 0)
  }
}
