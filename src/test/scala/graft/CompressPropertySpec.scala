package graft

import graft.etl.Compress
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (FIXTURES.md §2): for ARBITRARY tick streams, the
  * compression invariants hold — every (key, day) boundary row is kept,
  * and every dropped row is an interior row that moved ≤ 0.1%.
  */
class CompressPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genStream: Gen[List[(Long, Int, Double)]] = for {
    nKeys <- Gen.choose(1, 3)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, nKeys - 1L)
      // prices with occasional tiny moves so both keep and drop paths fire
      cents <- Gen.frequency(
        (5, Gen.choose(10000, 10015)), // ~0.01% steps → dropped
        (1, Gen.choose(5000, 20000)))  // big moves → kept
    } yield (key, cents))
  } yield rows.zipWithIndex.map { case ((k, c), i) => (k, i, c / 100.0) }

  private def invariantsHold(rows: List[(Long, Int, Double)]): Boolean = {
    // seq index → distinct micros timestamps spread across 3 "days"
    val df = rows.map { case (k, i, v) =>
      (k, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(i.toLong * 30000)), v) // 30000s ≈ crosses day bounds
    }.toDF("key", "ts", "value")
    val kept = Compress.tickCompression(df, "key", "ts", "value")

    val boundaries = df.groupBy($"key", to_date($"ts").as("day"))
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
    val missingFirst = boundaries.join(kept,
      boundaries("key") === kept("key") && boundaries("first_ts") === kept("ts"),
      "left_anti").count()
    val missingLast = boundaries.join(kept,
      boundaries("key") === kept("key") && boundaries("last_ts") === kept("ts"),
      "left_anti").count()
    val missingBoundary = missingFirst > 0 || missingLast > 0

    val w = org.apache.spark.sql.expressions.Window.partitionBy($"key").orderBy($"ts")
    val droppedBig = df
      .withColumn("prev", lag($"value", 1).over(w))
      .withColumn("pct", abs($"value" - $"prev") /
        when(abs($"prev") === 0, lit(null)).otherwise(abs($"prev")))
      .join(kept.select($"key", $"ts"), Seq("key", "ts"), "left_anti")
      .filter($"pct" > 0.001)
      .count() > 0

    !missingBoundary && !droppedBig
  }

  test("compression invariants hold for arbitrary generated tick streams") {
    val prop = Prop.forAll(genStream)(invariantsHold)
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(result.passed, result.status.toString)
  }

  test("typed OHLC aggregator is partitioning-invariant (merge order-independence)") {
    // for arbitrary streams and arbitrary partition counts, the typed
    // Aggregator (partial + merge) must equal the expression path
    val gen = for {
      rows <- genStream
      parts <- Gen.choose(1, 7)
    } yield (rows, parts)
    val prop = Prop.forAll(gen) { case (rows, parts) =>
      val df = rows.map { case (k, i, v) =>
        (k, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i.toLong * 30000)), v)
      }.toDF("key", "ts", "value").repartition(parts)
      val a = graft.etl.Candles.ohlcvDaily(df, "key", "ts", "value")
        .select($"key", $"day", $"open", $"high", $"low", $"close", $"volume")
      val b = graft.operators.OhlcAggregator.dailyCandles(df, "key", "ts", "value")
        .select($"key", $"day", $"open", $"high", $"low", $"close", $"volume")
      a.count() == b.count() &&
        a.join(b, Seq("key", "day", "open", "high", "low", "close", "volume"), "left_anti").count() == 0
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(result.passed, result.status.toString)
  }
}
