package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed GLOBAL row_number in a total order — the scalable form of
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY, which Spark
  * plans as Exchange SinglePartition + one-reducer sort (WindowExec even
  * logs "can cause serious performance degradation"). Found live by the
  * round-10 partitionless-window audit under `gini_concentration` and
  * `rfm_segmentation`: outputs were small enough to pass the
  * orderedSmall guard while the window INPUT (every user) serialized
  * through one task — at 10⁹ users, the hidden bottleneck.
  *
  * Same two-phase shape as [[PrefixSum]] (this is its COUNT
  * specialization over arbitrary composite orders):
  *
  *  1. range-repartition + in-partition sort on the order columns —
  *     partition i's keys all precede partition i+1's;
  *  2. pass 1: one row-count per partition to the driver (P scalars);
  *  3. pass 2: stream each partition once, rank = broadcast offset +
  *     local position.
  *
  * RDD passes are justified here the way PrefixSum's are (SURVEY.md
  * §7.3 preference (d)): position-in-partition is inherently sequential
  * per partition and Catalyst has no distributed primitive for it.
  *
  * Why both passes observe ONE partitioning — structurally, with no
  * cache in the way (the r10 form persisted the projection, which leaked
  * MEMORY_AND_DISK partitions into the session per call and, at 10⁹
  * rows, cached the whole population to protect against a drift that the
  * execution model already rules out):
  *
  *  - `Dataset.rdd` is a memoized lazy val, so every `parted.rdd` below
  *    is the SAME RDD instance over the same physical plan;
  *  - the plan's ShuffleExchangeExec computes its ShuffleDependency —
  *    and with it the RangePartitioner's sampled boundaries — exactly
  *    once per instance (memoized field), so the range layout is FIXED
  *    on the driver before either job runs;
  *  - the DAGScheduler reuses a computed shuffle map stage across jobs
  *    on the same dependency, so pass 2 reads the shuffle files pass 1
  *    materialized (the shuffle itself is the cache — no persist);
  *  - and if an executor dies and a partition must be recomputed, it is
  *    re-shuffled through the SAME fixed boundaries and re-sorted under
  *    the same total order — bit-identical, so ranks cannot drift even
  *    across partial recomputation (the cluster-loss case a persist
  *    could never protect anyway, since eviction recomputes too).
  *
  * The order must be a TOTAL order (include a unique tiebreak column)
  * for the ranks to be deterministic — same contract as the window
  * formulation it replaces.
  */
object GlobalRank {

  /** `df` plus `rankCol` = 1-based global row number under `order`. */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Seq[Column],
                     nParts: Int = 0): DataFrame =
    withGlobalRankAndCount(df, rankCol, order, nParts)._1

  /** Like [[withGlobalRank]], plus the TOTAL row count — pass 1 already
    * sums the per-partition counts on the driver, so the population size
    * is free. Callers that would otherwise attach `count(*)` as a 1-row
    * broadcast (percent_rank's divisor, NTILE's n) should take it from
    * here as a literal instead: one fewer aggregate, no scalar-attach
    * join in the plan at all.
    *
    * EAGER: pass 1 runs AT CONSTRUCTION TIME — calling this triggers two
    * Spark jobs (RangePartitioner boundary sampling + the per-partition
    * count collect) before the caller ever runs an action, because the
    * offsets must be known to build the returned plan. That is what makes
    * the count free and lets pass 2 reuse pass 1's shuffle files, but it
    * means `explain()` on a query built from this is not free, and a
    * query abandoned before its action still paid pass 1. Both collects
    * are O(numPartitions) scalars — bounded, never per-row.
    */
  def withGlobalRankAndCount(df: DataFrame, rankCol: String, order: Seq[Column],
                             nParts: Int = 0): (DataFrame, Long) = {
    require(order.nonEmpty, "order columns required")
    val spark = df.sparkSession
    val nP = if (nParts > 0) nParts else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(nP, order: _*)
      .sortWithinPartitions(order: _*)
    val counts = parted.rdd
      .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, it.size.toLong)))
      .collect().toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = Array.ofDim[Long](maxPid + 2)
    (0 to maxPid).foreach(p => offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L))
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rk = bc.value(pid)
      it.map { row => rk += 1; Row.fromSeq(row.toSeq :+ rk) }
    }
    val out = spark.createDataFrame(ranked,
      StructType(parted.schema.fields :+ StructField(rankCol, LongType, nullable = false)))
    (out, offsets(maxPid + 1))
  }

  /** SQL-standard NTILE(k) from a global rank: bucket sizes differ by at
    * most one, larger buckets first — `q = n div k`, `r = n mod k`,
    * buckets 1..r hold q+1 rows. Pure integer expressions, identical in
    * Spark and DuckDB, so entries stay hash-comparable to `ntile(k)
    * OVER (ORDER BY ...)` oracles without the single-partition window.
    */
  def ntileFromRank(rk: Column, n: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{floor, when}
    // double-division floors are exact for counts < 2^52 — far beyond any
    // rank this engine assigns (and the window ntile being replaced dies
    // at ~2^31 rows in one task long before that)
    val qi = floor(n.cast("double") / k).cast("long")
    val r = n.cast("long") % k
    val cut = r * (qi + 1) // rows in the first (bigger) buckets
    when(rk <= cut, floor((rk - 1).cast("double") / (qi + 1)).cast("long") + 1)
      .otherwise(r + floor((rk - cut - 1).cast("double") / qi).cast("long") + 1)
  }
}
