package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable distinct-count sketches — the pattern that turns
  * "distinct users over an arbitrary date range" from a full rescan into
  * a metadata-sized union. One HLL sketch (Spark's Datasketches
  * `hll_sketch_agg`) per day is written once when the day's data lands;
  * any later range query unions the relevant sketch rows (`hll_union_agg`
  * → `hll_sketch_estimate`) without touching the fact table again. This
  * is the third persisted-artifact store in the engine (after the MinHash
  * signature store and the ANN index) and follows the same contract:
  * self-describing, loud on scheme mismatch.
  *
  * Scale shape: building is one hash-agg over the day partition (the
  * sketch buffer is O(2^lgK) per group, ~2.5 KB at lgK=12); the store is
  * O(days) rows; a range estimate reads O(days-in-range) KB. Exactness is
  * traded for mergeability — the relative error of HLL at lgK=12 is
  * ~1.6 %, and the spec pins an error bound against the exact count.
  */
object SketchStore {

  private val SpecCol = "sketch_spec"

  private def spec(keyCol: String, lgK: Int) = s"hll:$keyCol:lgk=$lgK"

  /** One (day, sketch, n_rows) row per day of `events`. `mode` is
    * "overwrite" for a rebuild or "append" for landing new days of an
    * existing store (day grain makes appends disjoint).
    */
  def writeDailyDistinctSketch(
      events: DataFrame, tsCol: String, keyCol: String, path: String,
      lgK: Int = 12, mode: String = "overwrite"): Unit =
    events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
      .withColumn(SpecCol, lit(spec(keyCol, lgK)))
      .write.mode(mode).parquet(path)

  /** Estimated distinct `keyCol` values over [fromDay, toDay] — reads
    * only the store. Throws if the store was built over a different key
    * or precision: a mismatched sketch silently estimates the WRONG
    * population, so the check is load-bearing, not cosmetic.
    */
  def estimateDistinct(
      spark: SparkSession, path: String, keyCol: String,
      fromDay: String, toDay: String, lgK: Int = 12): Long = {
    val store = spark.read.parquet(path)
    val specs = store.select(SpecCol).distinct().collect().map(_.getString(0))
    require(specs.forall(_ == spec(keyCol, lgK)),
      s"sketch store at $path was built as ${specs.mkString(",")}, " +
        s"asked for ${spec(keyCol, lgK)} — refusing to estimate a different population")
    val row = store
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("est"))
      .head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }
}
