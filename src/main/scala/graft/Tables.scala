package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic Parquet testdata
  * (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loaders keep the access path behind one seam so the storage layout
  * can change without touching operators.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Size-adaptive scan spread (r17, guide §2.5/§6): the testdata writes
    * each table as ONE parquet row group, so a bare scan is a single
    * task no matter how many cores the session has — and every
    * tokenize/shingle/codec pass downstream of it serializes on one core
    * (measured: curate_neardup ran five ~0.8–1.9 s single-task jobs at
    * sf0.1 on local[32]; winnow_fingerprints one 3.1 s single-task job).
    * A hash repartition (on the table's natural key, [[spreadKey]]) to
    * the session's parallelism right after the scan fixes the straggler
    * shape for a few-MB shuffle.
    *
    * Scale-adaptive, not a local[32] constant: the spread fires only
    * when the relation's estimated size is below parallelism ×
    * maxPartitionBytes — i.e. when the scan CANNOT fill the cluster
    * anyway — so at production scale (TBs of input, thousands of
    * row groups) scans keep their natural splits and no extra exchange
    * of the corpus is ever paid. `spark.graft.scan.spreadMaxBytes`
    * overrides the cap (0 disables).
    *
    * Filters/projections still reach the parquet scan: Catalyst pushes
    * deterministic predicates below Repartition, so PushedFilters /
    * ReadSchema are unchanged (pinned by PlanAuditSpec).
    */
  /** Tables that OPT IN to the scan spread, with the natural key used as
    * its HASH partitioning key. Hash, not round-robin: round-robin pays
    * a full local SORT of the input inside the — by hypothesis single —
    * scan task (SPARK-23207; measured as a uniform +0.3–0.8 s tax on
    * every light query at sf0.1), hash is sort-free and deterministic
    * under task retry by construction.
    *
    * Opt-in, not blanket (r17 A/B over the full catalog): the spread's
    * map side IS the single scan task, which pays the serialization of
    * every row one-threaded — so spreading only wins when downstream
    * per-row compute dominates that serialization. Measured: documents
    * (tokenize/shingle/codec consumers, −0.2…−2.6 s each) and supplier
    * (md5 name synthesis + fuzzy blocking, −0.2…−1.0 s) win
    * consistently; lineitem/orders/events/embeddings consumers are
    * mostly scan→aggregate shapes where the extra AQE stage cost more
    * than the parallelism returned (+0.3…+0.7 s each over ~100 light
    * entries — net −30 s by reverting those).
    */
  private val spreadKey: Map[String, String] = Map(
    "documents" -> "doc_id", "supplier" -> "s_suppkey")

  private def spread(df: DataFrame, name: String): DataFrame = {
    val key = spreadKey.getOrElse(name, return df)
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    if (par <= 1) return df
    val cap = spark.conf.getOption("spark.graft.scan.spreadMaxBytes")
      .map(_.toLong)
      .getOrElse(par.toLong * spark.sessionState.conf.filesMaxPartitionBytes)
    if (cap <= 0) return df
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= cap)
      df.repartition(par, org.apache.spark.sql.functions.col(key))
    else df
  }

  /** Memoized per (session, dir, name): `spark.read.parquet` re-lists
    * the path and re-reads footers for schema inference on EVERY call —
    * ~20–50 ms of driver time per table per query construction, paid
    * ~2000 times per bench (r17; the registerAll views were already
    * memoized for exactly this reason in round 1). The cached value is
    * an immutable logical plan — no data is cached; every action still
    * scans parquet. A dir switch (different SF) misses the key and
    * re-reads.
    */
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.computeIfAbsent((spark, dir, name),
      _ => spread(spark.read.parquet(s"$dir/$name.parquet"), name))

  /** Canonicalize `events.ts` across testdata generations: older drops
    * write parquet TIMESTAMP(NANOS) (Spark 4 reads it only as a nanos
    * long under `nanosAsLong` — floor-divide to micros, exactly DuckDB's
    * truncation), newer drops write TIMESTAMP(MICROS) which Spark reads
    * as TIMESTAMP_NTZ (cast to the session-UTC instant type so every
    * downstream window/date op sees the same values either way).
    */
  def canonicalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // Every branch is session-timezone-sensitive somewhere downstream
    // (the NTZ→timestamp cast reads wall-clock through the session zone
    // directly; the others feed date/window extractions that do), and the
    // testdata's instants are UTC — a session not pinned to UTC would
    // silently shift events and diverge from the DuckDB oracle. Enforce
    // the invariant here, at the one seam every events read passes
    // through, instead of trusting each entrypoint to have set it.
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    // normalize before comparing: "Etc/UTC", "GMT", "+00:00" are all the
    // UTC instant line — rejecting them would break sessions that were
    // always correct
    val isUtc =
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    require(isUtc,
      s"events.ts canonicalization requires spark.sql.session.timeZone=UTC (got $tz); " +
        "set it in the SparkSession builder before reading events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    canonicalizeEventTs(load(spark, dir, "events"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Time-range read of events with the predicate pushed to the parquet
    * scan. Filtering the DERIVED micros timestamp cannot be pushed below
    * the nanos→micros projection (the scan would read every row group at
    * 100 TB); filtering the raw nanos long CAN — `floor(ns/1000) ∈ [s, e)`
    * ⇔ `ns ∈ [s·1000, e·1000)` for positive epochs.
    */
  def eventsInRange(spark: SparkSession, dir: String, startIso: String, endIso: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    def ldt(iso: String) = java.time.LocalDateTime.parse(iso.replace(' ', 'T'))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val filtered = raw.schema("ts").dataType match {
      case LongType => // nanos epoch: floor(ns/1000) ∈ [s, e) ⇔ ns ∈ [s·1000, e·1000)
        // Bound at MICROsecond precision — identical to the NTZ branch,
        // where `lit(LocalDateTime)` becomes a micros-precision timestamp
        // literal. (toEpochMilli here would truncate sub-second bounds to
        // milliseconds and the two branches would select different rows.)
        def ns(iso: String): Long = {
          val t = ldt(iso)
          (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L) * 1000L
        }
        raw.filter(col("ts") >= ns(startIso) && col("ts") < ns(endIso))
      case _ => // native timestamp: NTZ literals keep the predicate on the
        // scan column itself, so it still reaches PushedFilters
        raw.filter(col("ts") >= lit(ldt(startIso)) && col("ts") < lit(ldt(endIso)))
    }
    canonicalizeEventTs(filtered)
  }

  /** Canonical read: like `load`, but with per-table fixups (events' nanos
    * timestamps become micros).
    */
  def canonical(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else load(spark, dir, name)

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses (SURVEY.md §3.3 ad-hoc SQL surface).
    *
    * Memoized per (session, dir): re-registering 10 views per ad-hoc call
    * re-listed and re-inferred every table's schema — measured as the bulk
    * of `sql_adhoc_*` latency in round 1. Temp views are session-scoped
    * state, so the memo key includes the session; a dir switch (different
    * SF) re-registers.
    */
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registered.add((spark, dir))) {
      // a previous dir's memo entry is stale once this dir's views replace
      // the names — drop it so switching back re-registers
      registered.removeIf(k => k._1 == spark && k._2 != dir)
      all.foreach(n => canonical(spark, dir, n).createOrReplaceTempView(n))
      // catalog introspection rides along (memoized with the views): the
      // reference's diagnostics panel pastes information_schema SQL, so
      // the ad-hoc surface must serve it with zero extra setup
      graft.sql.Diagnostics.buildInformationSchema(spark, dir)
    }
  }
}
