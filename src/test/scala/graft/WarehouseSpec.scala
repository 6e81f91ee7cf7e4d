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
