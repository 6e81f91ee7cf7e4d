package graft

import graft.etl.{Candles, Companies, Compress}
import org.apache.spark.sql.functions._

/** Invariant checks from FIXTURES.md §2: tick compression keeps all
  * boundary rows and only >0.1% moves in the interior; OHLC candles
  * satisfy low ≤ open, close, mean ≤ high and volume = tick count.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ticks = Tables.events(spark, sf).select("user_id", "ts", "value")

  test("tick compression keeps first/last of every (key, day) and of every key") {
    val kept = Compress.tickCompression(ticks, "user_id", "ts", "value")
    val boundaries = ticks
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
    val missingFirst = boundaries.join(
      kept, boundaries("user_id") === kept("user_id") &&
        boundaries("first_ts") === kept("ts"), "left_anti")
    val missingLast = boundaries.join(
      kept, boundaries("user_id") === kept("user_id") &&
        boundaries("last_ts") === kept("ts"), "left_anti")
    assert(missingFirst.count() == 0 && missingLast.count() == 0)
  }

  test("tick compression drops only small moves (interior rows all moved > 0.1%)") {
    val kept = Compress.tickCompression(ticks, "user_id", "ts", "value")
    assert(kept.count() <= ticks.count())
    // every dropped row is interior and moved ≤ 0.1% vs its predecessor
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id").orderBy($"ts")
    val dropped = ticks
      .withColumn("prev", lag($"value", 1).over(w))
      .withColumn("pct", abs($"value" - $"prev") /
        when(abs($"prev") === 0, lit(null)).otherwise(abs($"prev")))
      .join(kept.select($"user_id", $"ts"), Seq("user_id", "ts"), "left_anti")
    assert(dropped.filter($"pct" > 0.001).count() == 0)
  }

  test("OHLCV candles: low ≤ open, close, mean ≤ high; volume = tick count") {
    val candles = Candles.ohlcvDaily(ticks, "user_id", "ts", "value")
    val bad = candles.filter(
      $"low" > $"open" || $"low" > $"close" || $"low" > $"mean" ||
        $"high" < $"open" || $"high" < $"close" || $"high" < $"mean")
    assert(bad.count() == 0)
    val vol = candles.agg(sum($"volume")).as[Long].head()
    assert(vol == ticks.count())
  }

  test("candles on a literal day reproduce the reference's first/max/min/last/sum") {
    val data = Seq(
      (1L, "2024-01-01 09:00:00", 10.0), (1L, "2024-01-01 10:00:00", 12.0),
      (1L, "2024-01-01 11:00:00", 8.0), (1L, "2024-01-01 12:00:00", 11.0),
      (2L, "2024-01-01 09:30:00", 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
    val c = Candles.ohlcvDaily(data, "user_id", "ts", "value")
      .filter($"user_id" === 1L).collect()(0)
    assert(c.getAs[Double]("open") == 10.0 && c.getAs[Double]("close") == 11.0)
    assert(c.getAs[Double]("high") == 12.0 && c.getAs[Double]("low") == 8.0)
    assert(c.getAs[Long]("volume") == 4L && c.getAs[Double]("mean") == 10.25)
  }

  test("scalable (key,day)-partitioned compression equals the key-partitioned one") {
    val a = Compress.tickCompression(ticks, "user_id", "ts", "value")
      .select("user_id", "ts", "value")
    val b = Compress.tickCompressionScalable(ticks, "user_id", "ts", "value")
      .select("user_id", "ts", "value")
    assert(a.count() == b.count())
    assert(a.join(b, Seq("user_id", "ts", "value"), "left_anti").count() == 0)
  }

  test("operators degrade gracefully on empty input (schema kept, zero rows, no crash)") {
    val empty = ticks.filter(lit(false))
    assert(Candles.ohlcvDaily(empty, "user_id", "ts", "value").count() == 0)
    assert(Compress.tickCompression(empty, "user_id", "ts", "value").count() == 0)
    assert(Compress.tickCompressionScalable(empty, "user_id", "ts", "value").count() == 0)
    assert(graft.analytics.Indicators.bollinger(empty, "user_id", "ts", "value").count() == 0)
    assert(graft.operators.OhlcAggregator.dailyCandles(empty, "user_id", "ts", "value").count() == 0)
    assert(graft.textops.Dedup.jaccardPairs(
      Tables.documents(spark, sf).filter(lit(false))).count() == 0)
    val c = Candles.ohlcvDaily(empty, "user_id", "ts", "value")
    assert(c.columns.toSet == Set("user_id", "day", "open", "high", "low", "close",
      "volume", "turnover", "mean"))
  }

  test("chart read path: candle table preferred, missing days filled from ticks") {
    import graft.analytics.ChartData
    val full = Candles.ohlcvDaily(ticks, "user_id", "ts", "value")
      .select($"user_id", $"day", $"open", $"high", $"low", $"close", $"volume")
    // candle table missing the second half of the range
    val partial = full.filter($"day" < "2024-01-15")
    val served = ChartData.candlesWithFallback(
      partial, ticks, "user_id", "2024-01-01", "2024-01-31")
    assert(served.count() == full.count())
    assert(served.join(full,
      Seq("user_id", "day", "open", "high", "low", "close", "volume"), "left_anti").count() == 0)
  }

  test("as-of join: latest right row at-or-before each left ts, per key") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L))
      .toDF("k", "lts").withColumn("lts", timestamp_seconds($"lts"))
    val right = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 9L, "z"))
      .toDF("k", "rts", "payload").withColumn("rts", timestamp_seconds($"rts"))
    val out = AsOfJoin.asofLeftJoin(left, right, "k", "lts", "rts", Seq("payload"))
      .select($"k", unix_timestamp($"lts").as("t"), $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      (1L, 10L, Some("a")), // tie: right row at exactly lts IS visible
      (1L, 20L, Some("a")),
      (1L, 30L, Some("b")),
      (2L, 5L, None)))      // nothing at-or-before → null
  }

  test("as-of join: matched row's NULL payload is returned, not backfilled from older rows") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 30L)).toDF("k", "lts")
      .withColumn("lts", timestamp_seconds($"lts"))
    // latest right row (t=25) has p1 null / p2 "new"; the older row (t=10)
    // has both non-null — DuckDB ASOF returns (null, "new"), never a blend
    val right = Seq((1L, 10L, Some("old1"), Some("old2")), (1L, 25L, None, Some("new")))
      .toDF("k", "rts", "p1", "p2").withColumn("rts", timestamp_seconds($"rts"))
    val out = AsOfJoin.asofLeftJoin(left, right, "k", "lts", "rts", Seq("p1", "p2"))
      .select($"p1", $"p2").collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(out.toSeq == Seq((None, Some("new"))))
  }

  test("approx_count_distinct within 5% of exact (documented A5 scale path)") {
    val ev = Tables.events(spark, sf)
    val exact = ev.agg(countDistinct($"user_id")).as[Long].head()
    val approx = ev.agg(approx_count_distinct($"user_id")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("OHLC aggregator: equal-timestamp ticks merge order-independently") {
    // round-1 advice: with strict ts-only comparisons, equal-ts ticks in
    // different partial buffers made open/close depend on merge order.
    // The (ts, value) total-order tie-break pins: open = min value at the
    // earliest ts, close = max value at the latest ts — for EVERY
    // partitioning
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-05 11:00:00")
    val df = Seq((1L, t0, 5.0), (1L, t0, 2.0), (1L, t0, 9.0),
      (1L, t1, 7.0), (1L, t1, 3.0))
      .toDF("key", "ts", "value")
    for (parts <- 1 to 5) {
      val c = graft.operators.OhlcAggregator
        .dailyCandles(df.repartition(parts), "key", "ts", "value")
        .select($"open", $"close", $"high", $"low").collect()(0)
      assert((c.getDouble(0), c.getDouble(1), c.getDouble(2), c.getDouble(3))
        == ((2.0, 7.0, 9.0, 2.0)), s"parts=$parts")
    }
  }

  test("typed OHLC aggregator equals the expression-path candles") {
    val expr = Candles.ohlcvDaily(ticks, "user_id", "ts", "value")
      .select($"user_id", $"day", $"open", $"high", $"low", $"close", $"volume")
    val typed = graft.operators.OhlcAggregator.dailyCandles(ticks, "user_id", "ts", "value")
      .select($"user_id", $"day", $"open", $"high", $"low", $"close", $"volume")
    assert(expr.count() == typed.count())
    assert(expr.join(typed,
      Seq("user_id", "day", "open", "high", "low", "close", "volume"), "left_anti").count() == 0)
  }

  test("company pipeline: dedup, new keys, dense ids, last-writer-wins") {
    val incoming = Seq(
      ("AAA", 3L, "Alpha"), ("AAA", 1L, "AlphaOld"), ("BBB", 2L, "Beta"),
      ("CCC", 5L, "Gamma"))
      .toDF("symbol", "version", "name")
    val deduped = Companies.dedupKeepFirst(incoming, "symbol", "version")
    assert(deduped.count() == 3)
    assert(deduped.filter($"symbol" === "AAA").select("name").as[String].head() == "AlphaOld")

    val existing = Seq("AAA").toDF("symbol")
    val fresh = Companies.newKeys(deduped, existing, "symbol")
    assert(fresh.select("symbol").as[String].collect().toSet == Set("BBB", "CCC"))

    val withIds = Companies.assignDenseIds(fresh, "symbol", maxExistingId = 10L)
    val ids = withIds.select("symbol", "id").as[(String, Long)].collect().toMap
    assert(ids == Map("BBB" -> 11L, "CCC" -> 12L))

    val resolved = Companies.lastWriterWins(incoming, "symbol", "version", Seq("name"))
    assert(resolved.filter($"symbol" === "AAA").select("name").as[String].head() == "Alpha")
  }

  test("candle-state merge: any chunking, any fold order == one-shot batch (property)") {
    // the materialized-rollup contract behind candles_incremental: the
    // mergeable state must be insensitive to HOW ticks were chunked and
    // in WHICH order partial states fold — else a refresh schedule could
    // change the candles it maintains
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(8, 40)
      nChunks <- Gen.choose(2, 4)
      assign <- Gen.listOfN(n, Gen.choose(0, nChunks - 1))
      order <- Gen.const(new scala.util.Random(assign.hashCode.toLong)
        .shuffle((0 until nChunks).toList))
    } yield (n, nChunks, assign, order)
    val prop = Prop.forAll(gen) { case (n, nChunks, assign, order) =>
      // distinct second-resolution timestamps over 3 days, 2 keys
      val rows = (0 until n).map { i =>
        (i % 2 + 1L, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 9000L)),
          (i * 37 % 100) / 10.0, assign(i))
      }
      val df = rows.toDF("user_id", "ts", "value", "chunk").localCheckpoint(true)
      val chunks = order.map(c =>
        Candles.candleState(df.filter($"chunk" === c), "user_id", "ts", "value"))
      val folded = Candles.finishCandles(
        chunks.reduce(Candles.mergeCandleStates(_, _, "user_id")))
      val batch = Candles.ohlcvDaily(df, "user_id", "ts", "value")
      val key = Seq("user_id", "day", "open", "high", "low", "close", "volume")
      folded.select(key.map(col): _*).exceptAll(batch.select(key.map(col): _*)).isEmpty &&
        batch.select(key.map(col): _*).exceptAll(folded.select(key.map(col): _*)).isEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
