package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum of a long column in a global order —
  * the primitive behind concat-then-split sequence packing, global byte
  * offsets, and file-offset assignment.
  *
  * `SUM(...) OVER (ORDER BY k)` without a PARTITION BY funnels the whole
  * dataset through ONE reducer — the textbook non-scalable plan. This is
  * the scalable classic instead (SURVEY.md §7.3 preference (d),
  * mapPartitions justified: a prefix sum is inherently sequential per
  * partition and Catalyst has no distributed-scan primitive for it):
  *
  *  1. range-repartition + in-partition sort on the order column — range
  *     partition i holds keys strictly below partition i+1's;
  *  2. pass 1: ONE total per partition to the driver (P scalars — the
  *     only driver-side data, independent of row count);
  *  3. pass 2: stream each partition once more, seeding its running sum
  *     with the broadcast exclusive prefix of earlier partitions' totals.
  *
  * Two linear passes, no global shuffle beyond the range partitioning,
  * result invariant to the (sampled) range boundaries.
  */
object PrefixSum {

  /** (orderCol, valueCol, start_off) where start_off = Σ value over all
    * rows strictly before this one in orderCol order. orderCol must be
    * unique; both columns must be castable to long.
    *
    * `nParts` ≤ 0 (the default) follows the session's
    * `spark.sql.shuffle.partitions` — the same knob that sizes every
    * other shuffle, so a cluster tuned for its data volume gets a
    * matching scan width here instead of a hardcoded 32. The result is
    * invariant to the choice (ScaleOpsSpec checks two widths).
    *
    * The slim (order, value) projection stays persisted after the call
    * (both passes must observe one partitioning); Spark's ContextCleaner
    * reclaims it when the returned plan is garbage-collected.
    */
  def exclusivePrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      nParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nP = if (nParts > 0) nParts else spark.sessionState.conf.numShufflePartitions
    // persisted: BOTH passes must see the identical partitioning. Range
    // boundaries come from deterministic sampling, but pinning the
    // materialized partitions removes any recompute hazard — a boundary
    // drift between pass 1 and pass 2 would silently corrupt offsets.
    val parted = df
      // a row without an order key or a value cannot take part in a
      // prefix sum (and nulls break the typed tuple encoder outright —
      // gauntlet finding: a null-text doc has a null token count)
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(orderCol).cast("long"), col(valueCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(nP, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = parted.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().toMap
    val maxPid = if (totals.isEmpty) -1 else totals.keys.max
    val offsets = Array.ofDim[Long](maxPid + 2)
    (0 to maxPid).foreach(p => offsets(p + 1) = offsets(p) + totals.getOrElse(p, 0L))
    val bc = spark.sparkContext.broadcast(offsets)
    parted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { case (k, v) =>
        val start = run
        run += v
        (k, v, start)
      }
    }.toDF(orderCol, valueCol, "start_off")
  }
}
