package graft

import graft.sources.{Sources, Warehouse}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshWarehouse(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val ticks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, ts("2024-01-01 11:00:00"), 11.0),
      (1L, ts("2024-01-02 10:00:00"), 20.0),
      (2L, ts("2024-01-02 11:00:00"), 21.0),
      (1L, ts("2024-01-03 10:00:00"), 30.0)
    ).toDF("user_id", "ts", "value")
    Sources.writeDayPartitioned(ticks, "ts", "user_id", path)
    path
  }

  private def listFiles(path: String, day: String): Set[(String, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/day=$day"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen)).toSet
  }

  test("upsert replaces matched keys, inserts new ones, leaves other days' files untouched") {
    val path = freshWarehouse()
    val day1Before = listFiles(path, "2024-01-01")
    val day3Before = listFiles(path, "2024-01-03")

    val updates = Seq(
      (1L, ts("2024-01-02 15:00:00"), 99.0), // replaces (1, day2)
      (7L, ts("2024-01-02 16:00:00"), 77.0) // new key on day2
    ).toDF("user_id", "ts", "value")
    Warehouse.upsertDayPartitioned(spark, path, updates, "ts", Seq("user_id"))

    val after = spark.read.parquet(path)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(after == Set(
      (1L, 10.0, "2024-01-01"), (2L, 11.0, "2024-01-01"),
      (1L, 99.0, "2024-01-02"), (2L, 21.0, "2024-01-02"), (7L, 77.0, "2024-01-02"),
      (1L, 30.0, "2024-01-03")))
    // untouched partitions keep their exact files
    assert(listFiles(path, "2024-01-01") == day1Before)
    assert(listFiles(path, "2024-01-03") == day3Before)

    // replaying the identical upsert converges (idempotent)
    Warehouse.upsertDayPartitioned(spark, path, updates, "ts", Seq("user_id"))
    val replayed = spark.read.parquet(path)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(replayed == after)
  }

  test("compaction folds fragmented days to one sorted file and skips healthy days") {
    val path = freshWarehouse()
    val day1Before = listFiles(path, "2024-01-01")
    // fragment day 2: append a second file directly into the partition dir
    Seq((9L, ts("2024-01-02 12:00:00"), 90.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$path/day=2024-01-02")
    assert(listFiles(path, "2024-01-02").size >= 2)

    val before = spark.read.parquet(path)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    val compacted = Warehouse.compactDayPartitions(spark, path, "user_id", "ts")
    assert(compacted == Seq("2024-01-02"))
    assert(listFiles(path, "2024-01-02").size == 1)
    assert(listFiles(path, "2024-01-01") == day1Before) // healthy day untouched
    val afterRows = spark.read.parquet(path)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(afterRows == before) // lossless

    // second pass: nothing fragmented, nothing rewritten
    assert(Warehouse.compactDayPartitions(spark, path, "user_id", "ts").isEmpty)
  }

  test("filesPerDay=1 keeps the exact one-file-per-day contract on multi-day upserts") {
    // a range shuffle's sampled boundary can land mid-day and split a
    // day into two files — which default compaction would then re-flag
    // as fragmented after EVERY multi-day upsert. fpd=1 must use the
    // hash-by-day path so the contract is exact, not probabilistic.
    val path = freshWarehouse()
    val updates = Seq(
      (50L, ts("2024-01-01 12:00:00"), 1.0),
      (51L, ts("2024-01-02 12:00:00"), 2.0),
      (52L, ts("2024-01-02 13:00:00"), 3.0)
    ).toDF("user_id", "ts", "value")
    Warehouse.upsertDayPartitioned(spark, path, updates, "ts", Seq("user_id"))
    assert(listFiles(path, "2024-01-01").size == 1)
    assert(listFiles(path, "2024-01-02").size == 1)
    // so a default-config compaction right after an upsert is a no-op
    assert(Warehouse.compactDayPartitions(spark, path, "user_id", "ts").isEmpty)
  }

  test("upsert file fan-out: filesPerDay=4 yields sorted, disjoint-key-range files; pruning and replay survive") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = freshWarehouse()
    // a hot day: 4000 distinct keys landing on 2024-01-02 (the 100 TB
    // scenario in miniature — one day far bigger than its neighbors)
    val hot = spark.range(4000).select(
      $"id".cast("long").as("user_id"),
      timestamp_seconds(lit(1704153600L) + $"id").as("ts"),
      ($"id" * 1.0).as("value")).localCheckpoint()
    Warehouse.upsertDayPartitioned(spark, path, hot, "ts", Seq("user_id"), filesPerDay = 4)

    // the hot day fanned out into multiple files (range sampling may give
    // 3–4 for a single staged day), each internally (key, ts)-sorted and
    // covering a key range DISJOINT from its siblings — the layout that
    // keeps reads parallel while row-group min/max skipping still prunes
    val files = listFiles(path, "2024-01-02").toSeq.map(_._1).sorted
    assert(files.size >= 2 && files.size <= 4, s"expected 2..4 files, got ${files.size}")
    val ranges = files.map { f =>
      val pairs = spark.read.parquet(s"$path/day=2024-01-02/$f")
        .select($"user_id", $"ts".cast("long")).as[(Long, Long)].collect().toSeq
      assert(pairs == pairs.sorted, s"$f is not (key, ts)-sorted")
      (pairs.map(_._1).min, pairs.map(_._1).max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"file key ranges overlap: $ranges")
      case _ => ()
    }

    // lossless merge: day2 = the 4000 update keys (1, 2 replaced), other days intact
    val day2 = spark.read.parquet(path).filter($"day".cast("string") === "2024-01-02")
    assert(day2.count() == 4000L)
    assert(spark.read.parquet(path).count() == 4003L)

    // partition pruning over the fanned-out table: a day-filtered read
    // touches only that day's files
    val q = spark.read.parquet(path).filter($"day" === "2024-01-02" && $"user_id" === 10L)
    assert(q.collect().length == 1)
    val scan = (q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec"))
    assert(scan.metrics("numFiles").value == files.size.toLong,
      s"scan read ${scan.metrics("numFiles").value} files, day has ${files.size}")

    // replaying the identical fan-out upsert converges (idempotent)
    Warehouse.upsertDayPartitioned(spark, path, hot, "ts", Seq("user_id"), filesPerDay = 4)
    val replayed = spark.read.parquet(path).filter($"day".cast("string") === "2024-01-02")
      .agg(count(lit(1)), sum($"value")).as[(Long, Double)].head()
    assert(replayed == ((4000L, hot.agg(sum($"value")).as[Double].head())))

    // compaction honors a >1 target: fragment the hot day well past the
    // threshold, compact back to at most 4 sorted files — never one
    (0 until 6).foreach { i =>
      Seq((10000L + i, ts(s"2024-01-02 0$i:30:00"), 1.0)).toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$path/day=2024-01-02")
    }
    val before = spark.read.parquet(path).count()
    val compacted = Warehouse.compactDayPartitions(spark, path, "user_id", "ts",
      maxFilesPerDay = 4, targetFilesPerDay = 4)
    assert(compacted == Seq("2024-01-02"))
    val nAfter = listFiles(path, "2024-01-02").size
    assert(nAfter >= 2 && nAfter <= 4, s"expected 2..4 files after compaction, got $nAfter")
    assert(spark.read.parquet(path).count() == before) // lossless
  }

  test("z-ordered day-partitioned write: partition prune AND row-group skip fire on a real read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = java.nio.file.Files.createTempDirectory("graft-whz").toString
    val nDays = 8
    // 60k ticks over 8 days, x=user_id in [0,400), y=value in [0,1e5)
    val ticks = spark.range(60000).select(
      pmod(hash($"id" * 13), lit(400)).cast("long").as("user_id"),
      timestamp_micros(lit(1704067200000000L) +
        pmod($"id", lit(nDays)) * 86400000000L +
        pmod(hash($"id"), lit(86400)) * 1000000L).as("ts"),
      (abs(hash($"id" * 7)) % 100000).cast("double").as("value"))
      .localCheckpoint()
    // the z-write's repartitionByRange SAMPLES its boundaries with an RNG
    // seeded by rdd id — which depends on how many RDDs the shared suite
    // session created before this test, so an unlucky seed can straddle a
    // boundary mid-day and surface ~0.7 of the day instead of ~0.3
    // (observed once under a loaded full suite; deterministic alone).
    // Re-laying out ONCE on a failed skip bound draws fresh boundaries;
    // two independent layouts both failing the bound would be a real bug
    // and still fail the hard assert below.
    def layout(): Unit = Warehouse.writeDayPartitionedZOrdered(
      ticks, "ts", $"user_id", $"value", bits = 11, nFiles = 64, path = path)
    layout()
    val back = spark.read.parquet(path)
    assert(back.count() == 60000L) // a relayout, not a rewrite

    // the warehouse's real read shape: day predicate + point key predicate.
    // NOTE: collect(), not count() — count() builds a NEW QueryExecution,
    // leaving q.queryExecution's metrics untouched (zeros, and every
    // metric assert below passes vacuously)
    val want = ticks.filter(to_date($"ts") === "2024-01-03" && $"user_id" === 123L).count()
    assert(want > 0, "fixture must select rows or the audit is vacuous")
    // scan metrics flow back through accumulators; under a loaded suite
    // one execution can be read before its updates land — re-executing a
    // fresh QueryExecution (bounded) absorbs that race without weakening
    // any assertion (the final attempt's values are still hard-asserted)
    def readOnce(): (FileSourceScanExec, Long, Long) = {
      // fresh read per attempt: the re-layout above replaces files, and a
      // cached InMemoryFileIndex would serve the stale listing
      val q = spark.read.parquet(path)
        .filter($"day" === "2024-01-03" && $"user_id" === 123L)
      assert(q.collect().length == want) // executes q's OWN plan
      val plan = q.queryExecution.executedPlan
      val scan = (plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no FileSourceScanExec in\n" + plan))
      (scan, scan.metrics("numFiles").value, scan.metrics("numOutputRows").value)
    }
    val perDay = 64.0 / nDays
    val dayRows = 60000.0 / nDays
    def metricsLanded(t: (FileSourceScanExec, Long, Long)) =
      t._2 > 0 && t._3 > 0
    var (scan, filesRead, surfaced) =
      Iterator.continually(readOnce()).take(3).find(metricsLanded)
        .getOrElse(readOnce())
    if (surfaced >= 0.7 * dayRows) { // unlucky sampled boundary — re-layout once
      layout()
      val t = Iterator.continually(readOnce()).take(3).find(metricsLanded)
        .getOrElse(readOnce())
      scan = t._1; filesRead = t._2; surfaced = t._3
    }
    // (1) the day predicate prunes partitions at listing time
    assert(!scan.toString.contains("PartitionFilters: []"),
      "day predicate should be a partition filter")
    // (2) the key predicate is PUSHED to parquet (drives row-group skip)
    assert(scan.toString.contains("PushedFilters: [") &&
      scan.toString.contains("EqualTo(user_id,123)"), scan.toString.take(800))
    // (3) files READ (scan metric) = one day's slice of the 64 files,
    // not the table; range boundaries can straddle a day, so allow 2x
    assert(filesRead > 0, "scan metrics not populated — plan was never executed")
    assert(filesRead <= 2 * perDay + 1,
      s"scan read $filesRead files — partition pruning did not fire")
    // (4) row-group min/max skipping fired: the scan SURFACED only the
    // rows of the z-files whose (user_id, value) box contains the point,
    // well under the day's full row count
    assert(surfaced < 0.7 * dayRows,
      s"scan surfaced $surfaced of ~$dayRows day rows — no row-group skip")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  test("schema evolution: upserts with new or missing columns null-fill instead of throwing") {
    val path = freshWarehouse() // days jan 1-3, columns (user_id, ts, value)
    // a new feed field arrives: replaces (1, day2), inserts (7, day4)
    val withVenue = Seq(
      (1L, ts("2024-01-02 15:00:00"), 99.0, "X"),
      (7L, ts("2024-01-04 16:00:00"), 77.0, "Y")
    ).toDF("user_id", "ts", "value", "venue")
    Warehouse.upsertDayPartitioned(spark, path, withVenue, "ts", Seq("user_id"))
    val back = spark.read.option("mergeSchema", "true").parquet(path)
    val rows = back.select($"user_id", $"value", $"venue", $"day".cast("string"))
      .as[(Long, Double, Option[String], String)].collect().toSet
    assert(rows == Set(
      (1L, 10.0, None, "2024-01-01"), (2L, 11.0, None, "2024-01-01"),
      (1L, 99.0, Some("X"), "2024-01-02"), (2L, 21.0, None, "2024-01-02"),
      (7L, 77.0, Some("Y"), "2024-01-04"),
      (1L, 30.0, None, "2024-01-03")))

    // an OLD producer still missing `value` replaces (2, day2): absent
    // columns null-fill — last-writer-wins applies to the schema too
    val oldProducer = Seq((2L, ts("2024-01-02 11:30:00"), "Z"))
      .toDF("user_id", "ts", "venue")
    Warehouse.upsertDayPartitioned(spark, path, oldProducer, "ts", Seq("user_id"))
    val after = spark.read.option("mergeSchema", "true").parquet(path)
      .filter($"day" === "2024-01-02")
      .select($"user_id", $"value".isNull, $"venue")
      .as[(Long, Boolean, Option[String])].collect().toSet
    assert(after == Set((1L, false, Some("X")), (2L, true, Some("Z"))))
  }

  test("dynamic partition pruning: a filtered dim join prunes fact days at runtime") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // 20-day fact; the interesting days come from a DIM FILTER, so static
    // partition pruning cannot see them at plan time — only Spark's
    // dynamic partition pruning (runtime subquery from the broadcast dim)
    // can cut the scan to the named days
    val ticks = spark.range(20000).select(
      ($"id" % 50).as("user_id"),
      timestamp_micros(lit(1704067200000000L) +
        ($"id" % 20) * 86400000000L + $"id" * 1000L).as("ts"),
      ($"id" % 100).cast("double").as("value"))
    Sources.writeDayPartitioned(ticks, "ts", "user_id", path)
    val fact = spark.read.parquet(path)
    // the dim must be a REAL datasource: over a LocalRelation the
    // optimizer constant-folds the flag filter away (ConvertToLocal-
    // Relation) and the pruning rule no longer sees a selective predicate
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("2024-01-05", 1), ("2024-01-11", 1), ("2024-01-18", 0))
      .toDF("day_s", "flag")
      .select($"day_s".cast("date").as("day"), $"flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = fact.join(dim.filter($"flag" === 1), "day")
    assert(q.collect().length == 2000) // 2 of 20 days x 1000 rows/day

    // AQE materializes the join sides as QueryStageExec LEAVES — a plain
    // collect never descends into them, so recurse explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case s: QueryStageExec => scans(s.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten
    val scan = scans(q.queryExecution.executedPlan)
      .find(_.schema.fieldNames.contains("user_id")).get
    assert(scan.partitionFilters.mkString.contains("dynamicpruning"),
      s"no runtime pruning filter on the fact scan: ${scan.partitionFilters}")
    val totalFiles = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .count(_.getPath.getName.startsWith("day="))
    }
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0 && filesRead <= totalFiles / 5,
      s"DPP did not prune: read $filesRead files of a $totalFiles-day table")
  }

  test("deleteKeys scrubs a key everywhere, leaves clean days' files untouched, replays as a no-op") {
    val path = freshWarehouse() // user 1 on days 1,2,3; user 2 on days 1,2
    val day3Before = listFiles(path, "2024-01-03")
    // day 3 holds only user 1 — deleting user 2 must not rewrite it
    val rewritten = Warehouse.deleteKeys(spark, path, "user_id", Seq(2L), "ts")
    assert(rewritten == Seq("2024-01-01", "2024-01-02"))
    val rows = spark.read.parquet(path)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(rows == Set(
      (1L, 10.0, "2024-01-01"), (1L, 20.0, "2024-01-02"), (1L, 30.0, "2024-01-03")))
    assert(listFiles(path, "2024-01-03") == day3Before)
    // replay: nothing left to find, nothing rewritten
    assert(Warehouse.deleteKeys(spark, path, "user_id", Seq(2L), "ts").isEmpty)
  }

  test("deleteKeys drops a day partition entirely when every row of the day is deleted") {
    val path = freshWarehouse()
    // day 3 contains ONLY user 1 — deleting user 1 must remove the dir
    Warehouse.deleteKeys(spark, path, "user_id", Seq(1L), "ts")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/day=2024-01-03")))
    val rows = spark.read.parquet(path)
      .select($"user_id", $"day".cast("string")).as[(Long, String)].collect().toSet
    assert(rows == Set((2L, "2024-01-01"), (2L, "2024-01-02")))
  }

  test("vacuum removes only stale staging leftovers") {
    val path = freshWarehouse()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stale = new org.apache.hadoop.fs.Path(s"$path/_staging-dead")
    val fresh = new org.apache.hadoop.fs.Path(s"$path/_staging-live")
    fs.mkdirs(stale); fs.mkdirs(fresh)
    fs.setTimes(stale, System.currentTimeMillis() - 100000L, -1)
    val deleted = Warehouse.vacuum(spark, path, olderThanMs = 50000L)
    assert(deleted == Seq("_staging-dead"))
    assert(!fs.exists(stale) && fs.exists(fresh))
    // the table itself is untouched
    assert(spark.read.parquet(path).count() == 5)
  }

  test("staging lives on the warehouse filesystem under the table root, not driver tmp") {
    val path = freshWarehouse()
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def driverTmpStaging(): Set[String] = {
      val s = java.nio.file.Files.list(tmpRoot)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("graft-upsert") || n.startsWith("graft-compact"))
        .toSet
      finally s.close()
    }
    val tmpBefore = driverTmpStaging()

    val updates = Seq((1L, ts("2024-01-02 15:00:00"), 99.0)).toDF("user_id", "ts", "value")
    Warehouse.upsertDayPartitioned(spark, path, updates, "ts", Seq("user_id"))
    Seq((9L, ts("2024-01-02 12:00:00"), 90.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$path/day=2024-01-02")
    Warehouse.compactDayPartitions(spark, path, "user_id", "ts")

    // old behavior gone: nothing staged on the driver's local tmp
    assert(driverTmpStaging() == tmpBefore)
    // staging cleaned up: no _staging-* left under the table root
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("_staging-"))
    assert(leftovers.isEmpty, s"staging dirs not cleaned up: ${leftovers.mkString(",")}")

    // a crash-orphaned _staging dir must be INVISIBLE to table readers
    // (the `_` prefix convention readers already honor for _temporary)
    val rowsBefore = spark.read.parquet(path).count()
    Seq((999L, ts("2024-01-09 00:00:00"), 0.0)).toDF("user_id", "ts", "value")
      .write.parquet(s"$path/_staging-orphan")
    assert(spark.read.parquet(path).count() == rowsBefore)
  }
}
