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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
    * natively; read nanos as long and floor-divide to micros — exactly the
    * truncation DuckDB applies, so the oracle agrees bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
    def ns(iso: String): Long =
      java.time.LocalDateTime.parse(iso.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .filter(col("ts") >= ns(startIso) && col("ts") < ns(endIso))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
    }
  }
}
