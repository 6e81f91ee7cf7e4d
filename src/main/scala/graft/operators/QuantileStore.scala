package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable QUANTILE sketches — the third member of the
  * sketch-store family (HLL = distinct counts, Misra-Gries = heavy
  * hitters, this = distribution shape): per-day fixed-grid histograms
  * over a calibrated [lo, hi) value domain, so "p95 of value over any
  * date range" is a metadata-sized merge instead of a fact rescan.
  *
  * Why a fixed grid and not a KLL/t-digest: mergeability across days
  * REQUIRES every day to share bucket boundaries. With the domain
  * calibrated once (lo/hi from domain knowledge or a first-day scan),
  * a dense-grid histogram is exactly mergeable (bin counts add), its
  * error is a hard bound — |est − true| ≤ (hi−lo)/bins for in-domain
  * data, no distribution assumptions — and both build and merge are
  * plain hash-aggs that partial-aggregate map-side. Out-of-domain
  * values clamp into the edge bins and are counted in the clamp
  * columns, so a drifting domain is VISIBLE in the store rather than
  * silently mis-ranked.
  *
  * Store form: one row per (day, bin) with a count — O(days × occupied
  * bins) rows, self-describing via the spec column, loud on scheme
  * mismatch like SketchStore/the signature store/the ANN index.
  */
object QuantileStore {

  private val SpecCol = "sketch_spec"

  private def spec(valueCol: String, lo: Double, hi: Double, bins: Int) =
    s"histq:$valueCol:lo=$lo:hi=$hi:bins=$bins"

  /** One (day, bin, cnt, n_below, n_above) row group per day. `mode`
    * "append" lands new days of an existing store (day grain keeps
    * appends disjoint).
    */
  def writeDailyHistogram(
      events: DataFrame, tsCol: String, valueCol: String, path: String,
      lo: Double, hi: Double, bins: Int = 1024, mode: String = "overwrite"): Unit = {
    require(hi > lo, s"empty domain [$lo, $hi)")
    require(bins >= 2, s"bins must be >= 2 (got $bins)")
    val width = (hi - lo) / bins
    val bin = least(greatest(floor((col("v") - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    events
      .select(to_date(col(tsCol)).as("day"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("day"), bin.as("bin"))
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("v") < lo, 1)).as("n_below"),
        count(when(col("v") >= hi, 1)).as("n_above"))
      .withColumn(SpecCol, lit(spec(valueCol, lo, hi, bins)))
      .write.mode(mode).parquet(path)
  }

  /** Fold streamed appends back to one row per (day, bin). Per-batch
    * `mode="append"` maintenance accretes a row per (batch, day, bin);
    * estimates stay EXACT regardless (bins add), but the store grows
    * with batch count — this is its small-file compaction. Safe to run
    * any time; estimates before and after are identical.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val store = spark.read.parquet(path)
    // materialize before overwriting the input path (Spark correctly
    // refuses a plan that overwrites the files it is reading)
    val folded = store
      .groupBy("day", "bin", SpecCol)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("n_below")).as("n_below"),
        sum(col("n_above")).as("n_above"))
      .localCheckpoint()
    folded.write.mode("overwrite").parquet(path)
  }

  /** Quantile estimates over [fromDay, toDay] — reads only the store.
    * Returns (q, estimate) rows, estimate = midpoint of the bin holding
    * rank ⌈q·N⌉ in the merged histogram. Refuses a store built over a
    * different column/domain/grid: merged counts from mismatched grids
    * are not a histogram of anything.
    */
  def estimateQuantiles(
      spark: SparkSession, path: String, valueCol: String,
      fromDay: String, toDay: String, qs: Seq[Double],
      lo: Double, hi: Double, bins: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val store = spark.read.parquet(path)
    val specs = store.select(SpecCol).distinct().collect().map(_.getString(0))
    require(specs.forall(_ == spec(valueCol, lo, hi, bins)),
      s"quantile store at $path was built as ${specs.mkString(",")}, " +
        s"asked for ${spec(valueCol, lo, hi, bins)} — refusing to merge different grids")
    val width = (hi - lo) / bins
    val merged = store
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))
      .groupBy("bin").agg(sum(col("cnt")).as("cnt"))
    val cum = merged.withColumn("cum",
      sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bin")
          .rowsBetween(Long.MinValue, 0)))
    val total = cum.agg(sum(col("cnt")).as("n"))
    val qdf = spark.createDataset(qs)(org.apache.spark.sql.Encoders.scalaDouble).toDF("q")
    // rank = ceil(q*N); the estimate bin is the FIRST with cum >= rank.
    // Both non-equi joins are broadcasts of at-most-bins-row sides —
    // constant-size, the BNLJ shape PlanAuditSpec sanctions
    qdf.crossJoin(broadcast(total))
      .crossJoin(broadcast(cum))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("q").agg(min(col("bin")).as("bin"))
      .select(col("q"),
        (lit(lo) + (col("bin") + 0.5) * width).as("estimate"))
      .orderBy("q")
  }
}
