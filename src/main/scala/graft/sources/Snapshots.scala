package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot versioning (time travel) for the day-partitioned warehouse —
  * the Iceberg-shaped manifest layer a plain-parquet table needs before
  * "what did the table say last Tuesday" and "undo that bad backfill"
  * are answerable at 100 TB.
  *
  * Mechanics: data files are IMMUTABLE once written; what changes per
  * commit is a manifest under `_versions/` listing the files that are
  * live in that version. An upsert commit rewrites only the AFFECTED
  * days' rows into new files and re-points the manifest: untouched days'
  * files are shared by reference across every version that includes
  * them, so N versions of a 2000-day table cost N manifests plus the
  * rewritten days — never N copies. Readers resolve a manifest (one
  * O(files) metadata read, no directory listing) and scan exactly its
  * files; rollback is a new commit whose manifest equals the target
  * version's, so the audit trail is append-only and a rolled-back-FROM
  * version stays readable until vacuum.
  *
  * Commit protocol: the manifest writes via create-fails-if-exists on
  * the next version number — two racing writers cannot both claim a
  * version (optimistic concurrency, Iceberg's model); the loser retries
  * on fresh state. Manifest files are O(data files) text, written by the
  * driver on the warehouse's own filesystem (never a driver-local temp —
  * see Warehouse.withStaging's scaladoc for why that breaks on a
  * cluster).
  *
  * Layout: `root/data/day=<d>/<uuid>.parquet` + `root/_versions/v<n>`.
  * The `_`-prefixed manifest dir is invisible to a naive
  * `spark.read.parquet(root)` (Spark skips `_` paths), so the versioned
  * table cannot be half-read by accident.
  */
object Snapshots {

  private val VersionsDir = "_versions"

  private def fs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Latest committed version, 0 if none. */
  def currentVersion(spark: SparkSession, root: String): Int = {
    val (f, r) = fs(spark, root)
    val vd = new org.apache.hadoop.fs.Path(r, VersionsDir)
    if (!f.exists(vd)) 0
    else f.listStatus(vd).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }
      .foldLeft(0)(math.max)
  }

  /** Data-file paths (relative to root) live in `version`. */
  def manifest(spark: SparkSession, root: String, version: Int): Seq[String] = {
    val (f, r) = fs(spark, root)
    val mf = new org.apache.hadoop.fs.Path(r, s"$VersionsDir/v$version")
    require(f.exists(mf), s"no snapshot v$version under $root")
    val in = f.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  private def writeManifest(
      spark: SparkSession, root: String, version: Int, files: Seq[String]): Unit = {
    val (f, r) = fs(spark, root)
    val vd = new org.apache.hadoop.fs.Path(r, VersionsDir)
    if (!f.exists(vd)) f.mkdirs(vd)
    val mf = new org.apache.hadoop.fs.Path(vd, s"v$version")
    // overwrite=false: the atomic claim — a concurrent committer of the
    // same version number fails here instead of silently clobbering
    val out = f.create(mf, false)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the table as of `version` (latest when omitted). The day
    * partition column is recovered from the directory layout via
    * basePath, exactly as a full-table read would see it.
    */
  def readAt(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion(spark, root) else version
    val files = manifest(spark, root, v)
    require(files.nonEmpty, s"snapshot v$v of $root is empty")
    spark.read
      .option("basePath", s"$root/data")
      .option("mergeSchema", "true")
      .parquet(files.map(f => s"$root/data/$f"): _*)
  }

  /** Commit `updates` as a last-writer-wins upsert by `keyCols` within
    * each day (same merge semantics as `Warehouse.upsertDayPartitioned`):
    * affected days' live rows merge with the updates into NEW files; all
    * other days carry over by reference. First commit on an empty table
    * is the initial load. Returns the new version number.
    */
  def commitUpsert(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      tsCol: String,
      keyCols: Seq[String]): Int = {
    val up = updates.withColumn("day", to_date(col(tsCol)))
    val days = up.select(col("day")).distinct().collect().map(_.get(0))
    require(days.nonEmpty, "commit with no rows")
    val prev = currentVersion(spark, root)
    val merged =
      if (prev == 0) up
      else {
        val current = readAt(spark, root, prev).filter(col("day").isin(days: _*))
        current.join(up.select((keyCols :+ "day").map(col): _*),
          keyCols :+ "day", "left_anti")
          .unionByName(up, allowMissingColumns = true)
      }
    val newFiles = writeDataFiles(spark, root, merged, keyCols :+ tsCol)
    val affected = days.map(_.toString).toSet
    val carried =
      if (prev == 0) Seq.empty
      else manifest(spark, root, prev).filterNot(f => affected.contains(dayOf(f)))
    writeManifest(spark, root, prev + 1, carried ++ newFiles)
    prev + 1
  }

  /** Exactly-once streaming ingest: commit `updates` as version
    * `version` IF that version is still unclaimed; a replayed
    * micro-batch (same batchId → same target version) finds its version
    * already committed and becomes a no-op instead of double-applying.
    * This is the foreachBatch idempotence contract — the sink-side half
    * of exactly-once — expressed through the manifest's atomic version
    * claim: the data files a losing/replayed attempt wrote are orphans
    * referenced by no manifest, invisible to readers, and reclaimed by
    * vacuum. Returns true if this call performed the commit.
    *
    * `version` must be `currentVersion + 1` to commit (a gap would make
    * readAt of the missing versions throw); a replay of ANY older
    * version is recognized as already-applied.
    */
  def commitUpsertIfAbsent(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      version: Int): Boolean = {
    val cur = currentVersion(spark, root)
    if (version <= cur) return false // replayed batch: already committed
    require(version == cur + 1,
      s"version $version would leave a gap (current is $cur)")
    val committed = commitUpsert(spark, root, updates, tsCol, keyCols)
    assert(committed == version)
    true
  }

  /** Roll the table back to `toVersion` as a NEW commit (append-only
    * history — the bad version stays inspectable until vacuum). */
  def rollback(spark: SparkSession, root: String, toVersion: Int): Int = {
    val files = manifest(spark, root, toVersion)
    val next = currentVersion(spark, root) + 1
    writeManifest(spark, root, next, files)
    next
  }

  /** Delete data files referenced by NO retained version and manifests
    * of dropped versions. `keepLast` counts back from the current
    * version. Returns the deleted file paths (relative).
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must retain at least the current version")
    val cur = currentVersion(spark, root)
    val keep = ((cur - keepLast + 1) max 1) to cur
    val live = keep.flatMap(v => manifest(spark, root, v)).toSet
    val (f, r) = fs(spark, root)
    // qualify before relativize: listFiles returns scheme-qualified paths
    // (file:/… , hdfs://…) and URI.relativize against an unqualified base
    // silently returns the input absolute — every file would look
    // unreferenced and vacuum would delete the live table
    val dataDir = f.makeQualified(new org.apache.hadoop.fs.Path(r, "data"))
    val it = f.listFiles(dataDir, true)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        val rel = dataDir.toUri.relativize(st.getPath.toUri).getPath
        if (!live.contains(rel) && rel.endsWith(".parquet")) {
          f.delete(st.getPath, false)
          dropped += rel
        }
      }
    }
    (1 until keep.start).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(r, s"$VersionsDir/v$v"), false)
    }
    dropped.toSeq
  }

  private def dayOf(relFile: String): String =
    relFile.split('/').head.stripPrefix("day=")

  /** Write `df` (with a `day` column) as new immutable files under
    * `root/data/day=<d>/`, sorted within day on `sortCols`, and return
    * the new files' root-relative paths. Uses a per-commit staging write
    * + rename so a failed commit never leaves half-written files visible
    * in any manifest (manifests only ever reference renamed files).
    */
  private def writeDataFiles(
      spark: SparkSession, root: String, df: DataFrame, sortCols: Seq[String]): Seq[String] = {
    val (f, r) = fs(spark, root)
    val staging = new org.apache.hadoop.fs.Path(r, s"_commit-${java.util.UUID.randomUUID()}")
    try {
      df.repartition(col("day"))
        .sortWithinPartitions(("day" +: sortCols).map(col): _*)
        .write.mode("overwrite").partitionBy("day").parquet(f.makeQualified(staging).toString)
      val it = f.listFiles(staging, true)
      val moved = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet")) {
          val day = st.getPath.getParent.getName // day=<d>
          val destDir = new org.apache.hadoop.fs.Path(r, s"data/$day")
          if (!f.exists(destDir)) f.mkdirs(destDir)
          val unique = s"${java.util.UUID.randomUUID()}.parquet"
          f.rename(st.getPath, new org.apache.hadoop.fs.Path(destDir, unique))
          moved += s"$day/$unique"
        }
      }
      moved.toSeq
    } finally f.delete(staging, true)
  }
}
