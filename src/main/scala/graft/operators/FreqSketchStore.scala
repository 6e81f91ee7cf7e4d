package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable FREQUENCY sketches — count-min (Cormode &
  * Muthukrishnan 2005), one sketch per day, completing the engine's
  * sketch-store trio: HLL (distinct counts, [[SketchStore]]), KLL-style
  * quantiles ([[QuantileStore]]), and now point frequencies. "How often
  * did key X occur between any two dates" becomes an O(days) read of
  * d·w-cell arrays instead of a fact-table rescan; the exact companion
  * ([[FreqItems]] Misra-Gries + isin-confirm) answers the same question
  * with a corpus scan when exactness is required.
  *
  * The sketch is a d×w counter grid stored flat as `array<bigint>`
  * (row-major): cell (i, h_i(x)) accumulates every occurrence of x under
  * d independent md5-derived hash rows. Counters are LINEAR in the data
  * — merging days is element-wise array addition, so a range query sums
  * O(days) arrays and reads d cells; the point estimate is the min over
  * the d row cells, an upper bound on the true count that overcounts by
  * at most ~2N/w with probability 1−2^−d per the standard bound.
  *
  * Build shape: one posexplode (d cells per row) + one (day, cell)
  * hash-agg + one per-day scatter into the flat array via a
  * map_from_entries lookup — all shuffles on (day, cell), map-side
  * combinable, no driver-side rows. The store is self-describing
  * ([[SketchStore]]'s contract): reads under a different key column,
  * depth, or width refuse loudly rather than estimate garbage.
  */
object FreqSketchStore {

  private val SpecCol = "sketch_spec"

  private def spec(keyCol: String, d: Int, w: Int) = s"cms:$keyCol:d=$d:w=$w"

  /** Row-i hash position of `keyCol` in [0, w): the engine's canonical
    * md5-bucket idiom over an i-salted key — the same expression builds
    * the store and serves point queries, so they cannot drift.
    */
  private def posExpr(i: Int, keyExpr: String, w: Int): Column =
    expr(graft.textops.TextAnalysis.hashBucketExpr(
      s"concat('$i#', cast($keyExpr as string))", w))

  /** One (day, sketch, n_rows) row per day of `events`; append new days
    * of an existing store (day grain keeps appends disjoint).
    */
  def writeDailyFreqSketch(
      events: DataFrame, tsCol: String, keyCol: String, path: String,
      depth: Int = 4, width: Int = 1024, mode: String = "overwrite"): Unit = {
    val cells = events
      // null key/ts rows are dropped by contract (the md5 of a null key is
      // a null cell idx, and map_from_entries throws on a null map key —
      // one bad event must not abort the build); same drop contract as
      // OhlcAggregator / PrefixSum / TopKAggregator
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(keyCol))
      .select(col("day"), posexplode(
        array((0 until depth).map(i => posExpr(i, keyCol, width)): _*)).as(Seq("r", "c")))
      .groupBy(col("day"), (col("r") * width + col("c")).as("idx"))
      .agg(count(lit(1)).as("n"))
    cells
      .groupBy("day")
      .agg(
        map_from_entries(collect_list(struct(col("idx"), col("n")))).as("m"),
        (sum(col("n")) / depth).cast("long").as("n_rows"))
      .select(col("day"),
        transform(sequence(lit(0L), lit(depth.toLong * width - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("sketch"),
        col("n_rows"))
      .withColumn(SpecCol, lit(spec(keyCol, depth, width)))
      .write.mode(mode).parquet(path)
  }

  /** Estimated occurrences of `key` over [fromDay, toDay] — reads only
    * the store: element-wise range sum is folded into the d cell reads
    * (sum of minima ≤ min of sums never holds the right way, so the sum
    * happens per-cell FIRST, then the min across rows).
    */
  def estimateFreq(
      spark: SparkSession, path: String, keyCol: String, key: String,
      fromDay: String, toDay: String, depth: Int = 4, width: Int = 1024): Long = {
    val store = spark.read.parquet(path)
    val specs = store.select(SpecCol).distinct().collect().map(_.getString(0))
    require(specs.forall(_ == spec(keyCol, depth, width)),
      s"freq-sketch store at $path was built as ${specs.mkString(",")}, " +
        s"asked for ${spec(keyCol, depth, width)} — refusing to estimate a different population")
    // the key's d positions via the SAME expression that built the store
    // (a 1-row plan, not a JVM re-implementation that could drift)
    val lit1 = spark.range(1)
    val positions = (0 until depth).map { i =>
      lit1.select(posExpr(i, s"'${key.replace("'", "''")}'", width).as("c")).head().getLong(0)
    }
    val inRange = store.filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
    val sums = inRange.agg(
      positions.zipWithIndex.map { case (c, i) =>
        sum(element_at(col("sketch"), lit((i * width + c + 1).toInt))).as(s"s$i")
      }.head,
      positions.zipWithIndex.tail.map { case (c, i) =>
        sum(element_at(col("sketch"), lit((i * width + c + 1).toInt))).as(s"s$i")
      }: _*).head()
    if (sums.isNullAt(0)) 0L
    else (0 until depth).map(i => sums.getLong(i)).min
  }
}
