package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join without a nested loop.
  *
  * Spark plans a join whose ONLY predicates are inequalities
  * (`point BETWEEN start AND end`) as BroadcastNestedLoopJoin or — worse —
  * CartesianProduct: O(|points| × |intervals|) comparisons, the classic
  * scale-killer this repo's PlanAuditSpec bans outright. The reference has
  * no range join; this is a training-pipeline / time-series extension
  * (event-to-incident attribution, point-in-session lookup).
  *
  * Strategy (the standard bucketed rewrite, cf. the interval-join
  * literature and Spark's own range-join hints on other platforms):
  * quantize time into fixed buckets. Each interval is exploded into every
  * bucket it covers (`⌈span / bucket⌉ + 1` rows — bounded, because the
  * caller picks a bucket width on the order of the maximum interval
  * span); each point carries exactly ONE bucket. The join is then a plain
  * hash equi-join on the bucket key plus a residual `[start, end)` filter.
  * A (point, interval) pair can only meet in the point's own bucket, so
  * no duplicate elimination is needed — output multiplicity is exactly
  * the overlap multiplicity.
  *
  * 100 TB posture: work is `points + Σ interval-buckets + matches`, all
  * shuffle-partitioned by bucket; skew only if one time bucket holds a
  * disproportionate share of BOTH sides (mitigate by narrowing the bucket
  * or salting the hot bucket). AQE picks broadcast when one side is small.
  */
object RangeJoin {

  /** Join `points` (with microsecond-timestamp column `ts`) to `intervals`
    * carrying `[startCol, endCol)` half-open timestamp intervals.
    * Returns point columns + interval columns; inner join semantics
    * (points matching no interval are dropped).
    *
    * `bucketSeconds` must be ≥ the typical interval span for the
    * explosion factor to stay ~2; correctness holds for any value.
    */
  def pointInInterval(
      points: DataFrame,
      ts: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val bucketMicros = bucketSeconds * 1000000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / bucketMicros)

    // end is EXCLUSIVE: an interval ending exactly on a bucket boundary
    // must not be exploded into the boundary bucket (no point inside that
    // bucket can satisfy ts < end), hence the -1 microsecond
    val iv = intervals.withColumn(
      "_bucket",
      explode(sequence(
        bucketOf(col(startCol)),
        bucketOf(col(endCol) - expr("INTERVAL 1 MICROSECOND")))))

    val pt = points.withColumn("_bucket", bucketOf(col(ts)))

    pt.join(iv, Seq("_bucket"))
      .filter(col(ts) >= col(startCol) && col(ts) < col(endCol))
      .drop("_bucket")
  }
}
