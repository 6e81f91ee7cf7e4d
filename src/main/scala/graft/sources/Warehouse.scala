package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path maintenance for the day-partitioned Parquet warehouse
  * (the hypertable analog written by `Sources.writeDayPartitioned`):
  * partition-scoped copy-on-write upsert (the MERGE-INTO analog for a
  * plain-parquet table) and small-file compaction.
  *
  * Both are the operations a 100 TB warehouse actually runs daily:
  * late/corrected ticks merge into their day partitions without touching
  * the other ~2000 days, and streaming micro-batches' small files fold
  * into index-friendly sorted files. Only the AFFECTED partitions are
  * ever read or rewritten; the driver sees a day list, never rows.
  */
object Warehouse {

  /** Run `write` against a staging directory ON THE WAREHOUSE'S OWN
    * FILESYSTEM, under the table root; delete it afterwards. A
    * driver-local `java.nio` temp dir would resolve to EACH EXECUTOR'S
    * local disk on a real cluster — executors would write shards to 1000
    * different machines and the swap read would see only the driver's.
    * The `_` prefix keeps the staging dir invisible to readers of `path`
    * (Spark's file listing skips `_`/`.`-prefixed names, same convention
    * as `_temporary`/`_SUCCESS`), while an explicit read of the staging
    * path itself still works.
    */
  private def withStaging(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(root, s"_staging-${java.util.UUID.randomUUID()}")
    try write(fs.makeQualified(staging).toString)
    finally fs.delete(staging, true)
  }

  /** Swap staged rows into `path` via dynamic partition overwrite:
    * replaces exactly the day partitions present in the staged data,
    * restoring the sorted-within-day layout.
    *
    * `filesPerDay = 1` keeps the EXACT one-file-per-day contract via
    * `repartition(col("day"))` — a range shuffle's sampled boundary can
    * land mid-day and split a day into two files, which the default
    * `compactDayPartitions(maxFilesPerDay = 1)` would then re-flag as
    * fragmented and spuriously rewrite after every multi-day upsert. The
    * price (a hot day serializes through one task) is inherent to
    * requesting one file per day.
    *
    * `filesPerDay > 1` switches to
    * `repartitionByRange(nDays × filesPerDay, day, sortCols…)`: every
    * output slice is a contiguous key range within its day — one file
    * under its day dir, still (key, ts)-sorted and row-group
    * min/max-skippable — and the sampled boundaries give
    * data-proportional slicing: hot days naturally split into more
    * files, quiet days may share a task (their rows still route to the
    * right day dirs via `partitionBy`).
    */
  private def swapStaged(
      spark: SparkSession, path: String, staging: String, sortCols: Seq[String],
      nDays: Int, filesPerDay: Int): Unit = {
    require(filesPerDay >= 1, s"filesPerDay must be >= 1 (got $filesPerDay)")
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val rangeCols = (Seq("day") ++ sortCols).map(col)
      val staged = spark.read.parquet(staging)
      val arranged =
        if (filesPerDay == 1) staged.repartition(col("day"))
        else staged.repartitionByRange(math.max(1, nDays * filesPerDay), rangeCols: _*)
      arranged
        .sortWithinPartitions(rangeCols: _*)
        .write.mode("overwrite").partitionBy("day").parquet(path)
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Merge `updates` into the warehouse at `path` by `keyCols` identity
    * within each day: an existing row with an update's key is REPLACED
    * (last-writer-wins), a new key is INSERTED. Day partitions not
    * present in `updates` are not read, not written, and keep their
    * files byte-identical.
    *
    * Copy-on-write mechanics: merged rows stage first, then dynamic
    * partition overwrite replaces exactly the staged days — Spark
    * (correctly) refuses a plan that overwrites the files it is reading,
    * and the two-pass write is the cost any copy-on-write MERGE pays.
    * Idempotent: replaying the same `updates` converges to the same
    * table state.
    */
  def upsertDayPartitioned(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      filesPerDay: Int = 1): Unit = {
    val up = updates.withColumn("day", to_date(col(tsCol)))
    // O(affected days) on the driver — the partition-pruning predicate,
    // never row data
    val days = up.select(col("day")).distinct().collect().map(_.get(0))
    require(days.nonEmpty, "upsert with no rows")
    // mergeSchema + allowMissingColumns = schema evolution: an upsert may
    // carry a column the table has never seen (new feed field) or miss
    // one the table has (old producer) — either side's absent columns
    // null-fill instead of throwing, and a mixed-schema table (old days
    // without the column) still loads
    val current = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("day").isin(days: _*))
    val survivors = current.join(up.select((keyCols :+ "day").map(col): _*),
      keyCols :+ "day", "left_anti")
    val merged = survivors.unionByName(up, allowMissingColumns = true)

    withStaging(spark, path) { staging =>
      merged.write.mode("overwrite").parquet(staging)
      swapStaged(spark, path, staging, keyCols :+ tsCol, days.length, filesPerDay)
    }
  }

  /** Day-partitioned Z-ORDERED warehouse write: the layout
    * `Sources.writeDayPartitioned` establishes prunes perfectly on the
    * date predicate and on nothing else — a selective predicate on a
    * second key still reads every row group of the day. This variant
    * lays each day's files along the (x, y) Morton curve instead, so
    * after partition pruning picks the day, parquet row-group min/max
    * skipping (driven by the PUSHED filter, visible as `PushedFilters`
    * in the scan) drops the files whose (x, y) box misses the predicate.
    *
    * Plan shape: one tiny min/max agg for the curve normalizer, then a
    * single `repartitionByRange(day, z)` — each output task holds a
    * contiguous (day, curve-range) slice, so `partitionBy("day")` writes
    * it as ONE file inside its day directory covering a small (x, y)
    * box. Same single-shuffle cost as the plain sorted write.
    */
  def writeDayPartitionedZOrdered(
      df: DataFrame, tsCol: String,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int, nFiles: Int, path: String): Unit = {
    val dayed = df.withColumn("day", to_date(col(tsCol)))
    if (df.isEmpty) { // min/max of nothing is NULL — write schema-only
      dayed.write.mode("overwrite").partitionBy("day").parquet(path); return
    }
    dayed
      .withColumn("_z", graft.operators.ZOrder.normalizedZ(df, x, y, bits))
      .repartitionByRange(nFiles, col("day"), col("_z"))
      .sortWithinPartitions(col("day"), col("_z"))
      .drop("_z")
      .write.mode("overwrite").partitionBy("day").parquet(path)
  }

  /** Delete every row of the named keys across the whole warehouse — the
    * right-to-be-forgotten / bad-feed retraction maintenance op. Two
    * phases, both partition-scoped:
    *  1. DISCOVER the affected days with a key-pushed scan (the isin
    *     predicate reaches the parquet row groups, so days whose min/max
    *     exclude the keys are never decompressed) projecting only `day`;
    *  2. copy-on-write REWRITE of exactly those days via the same
    *     staged dynamic-partition-overwrite as upserts — days without
    *     the keys keep their files byte-identical.
    * Returns the rewritten days. Idempotent: a replay finds no affected
    * days and rewrites nothing.
    */
  def deleteKeys(
      spark: SparkSession,
      path: String,
      keyCol: String,
      keys: Seq[Any],
      tsCol: String): Seq[String] = {
    require(keys.nonEmpty, "deleteKeys with no keys")
    val table = spark.read.option("mergeSchema", "true").parquet(path)
    val hit = col(keyCol).isin(keys: _*)
    val days = table.filter(hit).select(col("day")).distinct()
      .collect().map(_.get(0))
    if (days.isEmpty) return Nil
    val survivors = table.filter(col("day").isin(days: _*)).filter(!hit)
    // a day can lose EVERY row: dynamic overwrite would leave its old
    // files untouched (nothing staged for it), so those day dirs are
    // removed explicitly — an absent partition is the correct state
    val kept = survivors.select(col("day")).distinct().collect().map(_.get(0)).toSet
    if (kept.nonEmpty) withStaging(spark, path) { staging =>
      survivors.write.mode("overwrite").parquet(staging)
      swapStaged(spark, path, staging, Seq(keyCol, tsCol), kept.size, 1)
    }
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    days.filterNot(kept).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"day=$d"), true)
    }
    days.map(_.toString).sorted.toSeq
  }

  /** Remove `_staging-*` directories left by upserts/compactions/deletes
    * that crashed between staging and swap. Safe while readers run —
    * `_`-prefixed dirs are invisible to them — and safe against races
    * with LIVE maintenance only when `olderThanMs` exceeds the longest
    * plausible job duration (default 24 h). Returns the deleted names.
    */
  def vacuum(spark: SparkSession, path: String, olderThanMs: Long = 86400000L): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cutoff = System.currentTimeMillis() - olderThanMs
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_staging-")
        && s.getModificationTime < cutoff)
      .map { s => fs.delete(s.getPath, true); s.getPath.getName }
  }

  /** Compact day partitions that fragmented into more than
    * `maxFilesPerDay` parquet files (streaming micro-batches, repeated
    * upserts) back into at most `targetFilesPerDay` sorted files per
    * day, restoring the (key, ts)-sorted layout `writeDayPartitioned`
    * establishes (the composite-index analog — min/max row-group
    * skipping needs the sort). `targetFilesPerDay > 1` is the 100 TB
    * knob: a hot day (~50 GB) compacted to ONE file serializes on one
    * task and produces a file no reader can parallelize over; N sorted
    * files covering disjoint key ranges keep both the write and every
    * later scan parallel while pruning identically.
    *
    * Candidate selection lists the filesystem — O(partitions + files) on
    * the driver, no row data — and partitions already at or under the
    * target are neither read nor written.
    */
  def compactDayPartitions(
      spark: SparkSession,
      path: String,
      keyCol: String,
      tsCol: String,
      maxFilesPerDay: Int = 1,
      targetFilesPerDay: Int = 1): Seq[String] = {
    require(targetFilesPerDay >= 1,
      s"targetFilesPerDay must be >= 1 (got $targetFilesPerDay)")
    require(targetFilesPerDay <= math.max(1, maxFilesPerDay),
      s"compacting to $targetFilesPerDay files/day would immediately re-qualify " +
        s"days as fragmented under maxFilesPerDay=$maxFilesPerDay")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val fragmented = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .filter(d => fs.listStatus(d.getPath).count(f =>
        f.getPath.getName.endsWith(".parquet")) > maxFilesPerDay)
      .map(_.getPath.getName.stripPrefix("day="))
    if (fragmented.isEmpty) return Nil

    val current = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("day").isin(fragmented: _*))
    withStaging(spark, path) { staging =>
      current.write.mode("overwrite").parquet(staging)
      swapStaged(spark, path, staging, Seq(keyCol, tsCol),
        fragmented.length, targetFilesPerDay)
    }
    fragmented
  }
}
