package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // typed Volume: DROPMALFORMED drops rows whose values fail to parse
  // (token-count-mismatch lines are null-padded/truncated by Spark CSV,
  // not treated as malformed)
  private val csvSchema = StructType(Seq(
    StructField("Symbol", StringType),
    StructField("Last", StringType),
    StructField("Volume", IntegerType)))

  test("dirty CSV scan drops malformed lines, keeps parseable ones") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("paris 2024-03-01.csv")
    Files.writeString(f,
      "Symbol\tLast\tVolume\n" +
        "AAA\t1 234,56 (c)\t100\n" +
        "XXX\tbroken\tnot_a_number\n" +
        "BBB\t77,5\t200\n")
    val df = Sources.dirtyCsv(spark, dir.toString, csvSchema)
    // NOTE: count() alone would report 3 — CSV column pruning parses no
    // columns for count, so malformed values are never seen; the drop
    // happens when the typed column is actually read
    val cleaned = df.select(
      $"Symbol",
      graft.ingest.Normalize.cleanPriceBoursorama($"Last").as("price"),
      $"Volume")
      .collect()
    assert(cleaned.length == 2)
    assert(cleaned.map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("AAA", 1234.56), ("BBB", 77.5)))
  }

  test("filename-date extraction + range pruning keeps only in-range files") {
    val dir = Files.createTempDirectory("graft-days")
    for (d <- Seq("2024-03-01", "2024-03-02", "2024-03-05"))
      Files.writeString(dir.resolve(s"paris $d.csv"),
        s"Symbol\tLast\tVolume\nAAA\t10\t1\n")
    val df = Sources.dirtyCsv(spark, dir.toString, csvSchema)
    val pruned = Sources.pruneByFileDate(df, "2024-03-01", "2024-03-02")
    assert(pruned.count() == 2)
    assert(pruned.select("file_date").distinct().as[java.sql.Date].collect()
      .map(_.toString).sorted.toSeq == Seq("2024-03-01", "2024-03-02"))
  }

  test("binary snapshot source: encode files, decode via binaryFile + flatMap") {
    import graft.sources.BinarySnapshots
    val dir = Files.createTempDirectory("graft-snap")
    Files.write(dir.resolve("paris 2024-03-01 09_00_00"),
      BinarySnapshots.encode(Seq((1L, 10.5, 100.0), (2L, 20.0, 50.0))))
    Files.write(dir.resolve("paris 2024-03-01 09_01_00"),
      BinarySnapshots.encode(Seq((1L, 10.7, 30.0))))
    val df = BinarySnapshots.read(spark, dir.toString).orderBy("ts", "key")
    val got = df.collect().map(r =>
      (r.getAs[Long]("key"), r.getAs[Double]("value"),
        r.getAs[java.sql.Timestamp]("ts").toString))
    assert(got.length == 3)
    assert(got(0) == ((1L, 10.5, "2024-03-01 09:00:00.0")))
    assert(got(2) == ((1L, 10.7, "2024-03-01 09:01:00.0")))
  }

  test("day-partitioned sink roundtrip with partition pruning") {
    val out = Files.createTempDirectory("graft-warehouse").resolve("stocks").toString
    val ticks = Tables.events(spark, sf).select("user_id", "ts", "value")
    Sources.writeDayPartitioned(ticks, "ts", "user_id", out)
    val back = spark.read.parquet(out)
    assert(back.count() == ticks.count())
    // a day predicate must prune partitions at planning time
    val oneDay = back.filter($"day" === "2024-01-05")
    val scanned = oneDay.queryExecution.executedPlan.toString
    assert(oneDay.count() ==
      ticks.filter(to_date($"ts") === "2024-01-05").count())
    assert(!scanned.contains("PartitionFilters: []"),
      "day predicate should appear as a partition filter")
  }

  test("JSONL scan parses well-formed rows and quarantines corrupt lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      ("""{"symbol": "AAA", "last": 12.5, "volume": 100}""" + "\n" +
        """{"symbol": "BBB", "last": "not-a-number", "volume": 5}""" + "\n" +
        """this is not json at all""" + "\n" +
        """{"symbol": "CCC", "last": 7.25, "volume": 42}""" + "\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "symbol STRING, last DOUBLE, volume LONG")
    val df = graft.sources.Sources.jsonLines(spark, dir.toString, schema).cache()
    val good = df.filter($"_corrupt".isNull)
      .select("symbol", "last").as[(String, Double)].collect().toSet
    assert(good == Set(("AAA", 12.5), ("CCC", 7.25)))
    // both the unparseable-field row and the non-JSON line are quarantined
    // whole, not dropped — ingest can count and route them
    assert(df.filter($"_corrupt".isNotNull).count() == 2)
    df.unpersist()
  }

  test("ORC round-trip: columnar alternative with predicate pushdown at the scan") {
    // the warehouse layout is format-agnostic: the same day-partitioned
    // sorted write lands as ORC (ships with Spark, no extra deps) and
    // reads back identically, with min/max-stripe predicate pushdown
    // visible at the scan node — the property row-group skipping relies
    // on. Parity is exact: ORC and parquet carry the same typed rows.
    val dir = Files.createTempDirectory("graft-orc").toString
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts", $"value")
    ev.sort("user_id", "ts").write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == ev.count())
    val filtered = back.filter($"user_id" === 3L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"expected the user_id predicate pushed to the ORC scan:\n$plan")
    val viaOrc = filtered.select("event_id").as[Long].collect().sorted.toSeq
    val viaParquet = ev.filter($"user_id" === 3L).select("event_id").as[Long].collect().sorted.toSeq
    assert(viaOrc == viaParquet)
  }

  test("eventsInRange: sub-second bounds select identical rows on the nanos and NTZ branches") {
    // regression pin for the r8 precision fix (Tables.scala:86): the
    // nanos-long branch used to bound at MILLIsecond precision via
    // toEpochMilli, so a boundary between two events 1 µs apart selected
    // different rows than the native-timestamp branch. Plant two events
    // 1 µs apart, straddle them with a sub-second boundary, and prove
    // both storage branches (raw nanos LONG vs TIMESTAMP_NTZ) return the
    // same single row.
    val microsTs = Seq( // (event_id, micros since epoch)
      1L -> 1704103200123456L, // 2024-01-01 10:00:00.123456
      2L -> 1704103200123457L, // 2024-01-01 10:00:00.123457
      3L -> 1704103201000000L) // 10:00:01
    val ntzDir = Files.createTempDirectory("graft-evntz").toString
    val nanosDir = Files.createTempDirectory("graft-evnanos").toString
    microsTs.toDF("event_id", "us")
      .select($"event_id", expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    microsTs.toDF("event_id", "us")
      .select($"event_id", ($"us" * 1000L).as("ts")) // nanos epoch long
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    def ids(dir: String, from: String, to: String): Seq[Long] =
      Tables.eventsInRange(spark, dir, from, to)
        .select("event_id").as[Long].collect().sorted.toSeq

    // boundary BETWEEN the two 1µs-apart events: start is inclusive
    val from = "2024-01-01 10:00:00.123457"
    val to = "2024-01-01 10:00:00.999999"
    assert(ids(ntzDir, from, to) == Seq(2L), "NTZ branch drifted on a sub-second bound")
    assert(ids(nanosDir, from, to) == Seq(2L), "nanos branch drifted on a sub-second bound")
    // exclusive end just past event 1 keeps only event 1 — both branches
    val upto = "2024-01-01 10:00:00.123457"
    assert(ids(ntzDir, "2024-01-01 10:00:00", upto) == Seq(1L))
    assert(ids(nanosDir, "2024-01-01 10:00:00", upto) == Seq(1L))
  }
}
