package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scale smoke: generate a deterministic 10M-row tick table (100×
  * the sf0.1 events table, same shape: 1500 keys × ~80 days) in a temp
  * dir, then run the full ETL composite (filter → compress → candle →
  * enrich-shaped aggregation) and the heavy window ops on it. Prints
  * per-stage wall times — evidence that the operator plans survive a
  * 100× scale-up without restructuring (SCALE.md).
  *
  * Usage: runMain graft.ScaleSmoke [nRows]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    timed(s"generate $n ticks") {
      spark.range(n)
        .select(
          col("id").as("event_id"),
          pmod(hash(col("id") * 7), lit(1500)).cast("long").as("user_id"),
          // deterministic pseudo-random walk-ish prices, ~80 days of micros
          timestamp_micros(lit(1704067200000000L) + col("id") * 700000L).as("ts"),
          (abs(hash(col("id"))) % 20000 / 100.0 + 1.0).as("value"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/ticks")
    }
    val ticks = spark.read.parquet(s"$dir/ticks")

    timed("full ETL: filter -> compress -> daily candles (count)") {
      val compressed = graft.etl.Compress.tickCompression(
        ticks.filter($"value" > 0), "user_id", "ts", "value")
      val candles = graft.etl.Candles.ohlcvDaily(compressed, "user_id", "ts", "value")
      println(s"[scale]   candles: ${candles.count()}")
    }
    timed("scalable (key,day) compression (count)") {
      println(s"[scale]   kept: ${graft.etl.Compress.tickCompressionScalable(ticks, "user_id", "ts", "value").count()}")
    }
    timed("bollinger window (force full evaluation)") {
      // count(bb_mid) makes the window non-prunable — a bare count() would
      // let Catalyst elide the window entirely
      val r = graft.analytics.Indicators.bollinger(ticks, "user_id", "ts", "value")
        .agg(count(col("bb_mid")), sum(col("bb_upper"))).collect()(0)
      println(s"[scale]   non-null bands: ${r.getLong(0)}")
    }
    timed("sessionization (count)") {
      println(s"[scale]   sessions: ${ticks.groupBy($"user_id", session_window($"ts", "30 minutes")).count().count()}")
    }

    // near-dup detection at a 25× corpus (50k vectors vs sf0.1's 2k),
    // PRODUCTION parameters: threshold 0.9 → wide 12-bit bands, 16
    // tables (the oracle's 0.4-threshold config needs many narrow
    // tables; at real near-dup thresholds the cost collapses — SCALE.md).
    // ids 25000-25999 are plants: copies of ids 0-999 with one dimension
    // shifted (cos ≈ 0.999) — the found-fraction is a recall proxy.
    timed("embedding near-dup, 50k vectors, threshold 0.9 (sign-LSH 16x12bit)") {
      val emb = spark.range(50000).select(
        col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), d ->
                  cast((hash((CASE WHEN id BETWEEN 25000 AND 25999 THEN id - 25000 ELSE id END) * 100 + d) % 2001) / 1000.0
                       + (CASE WHEN id BETWEEN 25000 AND 25999 AND d = 1 THEN 0.05 ELSE 0.0 END) as float))""")
          .as("embedding"))
      val pairs = graft.similarity.Similarity
        .nearDupPairs(emb, threshold = 0.9, sigBits = 64, tables = 16, bandBits = 12)
        .cache()
      val planted = pairs.filter($"vec_b" - $"vec_a" === 25000L).count()
      println(s"[scale]   pairs: ${pairs.count()}, planted found: $planted / 1000")
      pairs.unpersist()
    }
    spark.stop()
  }
}
