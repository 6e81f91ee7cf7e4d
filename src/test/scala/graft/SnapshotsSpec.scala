package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Snapshot versioning: every commit is a readable point-in-time view,
  * untouched days share files across versions by reference, rollback is
  * an append-only commit, vacuum reclaims only unreferenced files.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: (String, Long, Double)*) =
    rows.toDF("ts0", "key", "value")
      .select(to_timestamp($"ts0").as("ts"), $"key", $"value")

  private def snap(root: String, v: Int): Set[(String, Long, Double)] =
    Snapshots.readAt(spark, root, v)
      .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("t"), $"key", $"value")
      .as[(String, Long, Double)].collect().toSet

  test("time travel: each version reproduces its historical state exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val v1 = Snapshots.commitUpsert(spark, root,
      ticks(
        ("2024-01-01 10:00:00", 1L, 10.0),
        ("2024-01-01 11:00:00", 2L, 20.0),
        ("2024-01-02 10:00:00", 1L, 30.0)),
      "ts", Seq("key"))
    assert(v1 == 1)
    // v2: correct day-2 key 1, insert day-2 key 3; day 1 untouched
    val v2 = Snapshots.commitUpsert(spark, root,
      ticks(
        ("2024-01-02 10:00:00", 1L, 31.5),
        ("2024-01-02 12:00:00", 3L, 40.0)),
      "ts", Seq("key"))
    assert(v2 == 2 && Snapshots.currentVersion(spark, root) == 2)

    assert(snap(root, 1) == Set(
      ("2024-01-01 10:00:00", 1L, 10.0),
      ("2024-01-01 11:00:00", 2L, 20.0),
      ("2024-01-02 10:00:00", 1L, 30.0)))
    assert(snap(root, 2) == Set(
      ("2024-01-01 10:00:00", 1L, 10.0),
      ("2024-01-01 11:00:00", 2L, 20.0),
      ("2024-01-02 10:00:00", 1L, 31.5),
      ("2024-01-02 12:00:00", 3L, 40.0)))

    // structural sharing: day 1 was untouched by v2, so v2's manifest
    // must reference v1's day-1 files verbatim (no rewrite amplification)
    val m1 = Snapshots.manifest(spark, root, 1).filter(_.startsWith("day=2024-01-01")).toSet
    val m2 = Snapshots.manifest(spark, root, 2).filter(_.startsWith("day=2024-01-01")).toSet
    assert(m1.nonEmpty && m1 == m2, s"day-1 files not shared: v1=$m1 v2=$m2")
    // and day 2 was rewritten: no v1 day-2 file survives in v2
    val d2v1 = Snapshots.manifest(spark, root, 1).filter(_.startsWith("day=2024-01-02")).toSet
    val d2v2 = Snapshots.manifest(spark, root, 2).filter(_.startsWith("day=2024-01-02")).toSet
    assert(d2v1.intersect(d2v2).isEmpty)
  }

  test("rollback is an append-only commit; vacuum reclaims only unreferenced files") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Snapshots.commitUpsert(spark, root,
      ticks(("2024-01-01 10:00:00", 1L, 1.0)), "ts", Seq("key"))
    Snapshots.commitUpsert(spark, root,
      ticks(("2024-01-01 10:00:00", 1L, 2.0)), "ts", Seq("key")) // bad backfill
    val v3 = Snapshots.rollback(spark, root, 1)
    assert(v3 == 3)
    assert(snap(root, 3) == Set(("2024-01-01 10:00:00", 1L, 1.0)))
    assert(snap(root, 2) == Set(("2024-01-01 10:00:00", 1L, 2.0))) // still inspectable
    assert(Snapshots.manifest(spark, root, 3) == Snapshots.manifest(spark, root, 1))

    // retain v2..v3 → v1's files survive (v3 references them); retain
    // only v3 → v2's files (the bad backfill) are the ones reclaimed
    val droppedKeep2 = Snapshots.vacuum(spark, root, keepLast = 2)
    assert(droppedKeep2.isEmpty, s"v2/v3 both retained, nothing unreferenced: $droppedKeep2")
    val dropped = Snapshots.vacuum(spark, root, keepLast = 1)
    assert(dropped.nonEmpty)
    assert(snap(root, 3) == Set(("2024-01-01 10:00:00", 1L, 1.0))) // survivor intact
    intercept[Exception] { snap(root, 2) } // reclaimed version unreadable
  }

  test("change data feed: diffing two snapshot versions classifies the commit exactly") {
    // Snapshots (what did the table say at v?) + SnapshotDiff (how do two
    // versions differ?) compose into a change-data-feed: the diff of
    // consecutive versions IS the commit's effect, recoverable after the
    // fact without any change log.
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Snapshots.commitUpsert(spark, root,
      ticks(
        ("2024-01-01 10:00:00", 1L, 10.0),
        ("2024-01-01 11:00:00", 2L, 20.0)),
      "ts", Seq("key"))
    Snapshots.commitUpsert(spark, root,
      ticks(
        ("2024-01-01 10:00:00", 1L, 11.0),  // update key 1
        ("2024-01-01 12:00:00", 3L, 30.0)), // insert key 3
      "ts", Seq("key"))
    val cdf = graft.operators.SnapshotDiff.diff(
      Snapshots.readAt(spark, root, 1).select($"key", $"value"),
      Snapshots.readAt(spark, root, 2).select($"key", $"value"),
      Seq("key"))
      .select($"key", $"status").as[(Long, String)].collect().toMap
    assert(cdf == Map(1L -> "update", 3L -> "insert"), cdf.toString)
  }

  test("concurrent committers cannot claim the same version") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Snapshots.commitUpsert(spark, root,
      ticks(("2024-01-01 10:00:00", 1L, 1.0)), "ts", Seq("key"))
    // simulate the race: a manifest for v2 already exists when a second
    // writer tries to commit v2 — the claim must fail loudly
    val (f, r) = {
      val p = new org.apache.hadoop.fs.Path(root)
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    val out = f.create(new org.apache.hadoop.fs.Path(r, "_versions/v2"), false)
    out.write("day=2024-01-01/phantom.parquet\n".getBytes("UTF-8")); out.close()
    intercept[Exception] {
      Snapshots.commitUpsert(spark, root,
        ticks(("2024-01-01 11:00:00", 2L, 2.0)), "ts", Seq("key"))
    }
  }
}
