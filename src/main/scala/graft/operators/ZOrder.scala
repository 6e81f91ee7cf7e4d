package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two key
  * columns so that range predicates on EITHER key map to a bounded
  * number of contiguous curve ranges — the multi-dimensional
  * data-skipping layout (Delta OPTIMIZE ZORDER / Iceberg sort-order
  * idea, built here from plain Spark primitives).
  *
  * Why it matters at 100 TB: parquet row-group pruning works off
  * per-file/per-row-group min/max. A table range-partitioned on key A
  * prunes perfectly on A and not at all on B; Z-ordering (A, B) makes
  * every file a small rectangle in (A, B) space, so selective
  * predicates on either key skip most files. The interleave is pure
  * bit arithmetic (shiftright/&/shiftleft/| — codegen'd builtins, no
  * UDF), and the write is one `repartitionByRange(z)` (range exchange
  * with sampled bounds) + within-partition sort: exactly the shuffle
  * a plain sorted write already pays.
  */
object ZOrder {

  /** Morton-interleave of the low `bits` bits of two non-negative int
    * columns: x occupies even bit positions, y odd. 2×`bits` native
    * expressions folded with bitwiseOR — stays inside whole-stage
    * codegen.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)

  /** The same interleave as DuckDB SQL, generated from the same loop so
    * engine and oracle cannot drift. */
  def zValueDuck(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")

  /** Z-ordered write: min/max-normalize both keys onto the full `bits`
    * range (one tiny agg — REQUIRED, not cosmetic: raw interleave of an
    * 11-bit key with a 4-bit key has the narrow key's high bits always
    * zero, so the curve's top bits reduce to the wide key alone and the
    * layout degenerates to single-key), assign the curve value,
    * range-partition on it (sampled bounds — balanced files without a
    * global sort), sort within partitions, write. `nFiles` sizes the
    * output; at scale pick ~target-file-size / row-width. Production
    * variants replace min/max with quantile ranks to absorb skew — same
    * plan, different normalizer.
    */
  /** The min/max-normalized curve value against `df`'s OWN key ranges —
    * one tiny agg to the driver, then pure codegen'd bit arithmetic per
    * row. Callers must guard the empty-frame case (min/max are NULL).
    */
  private[graft] def normalizedZ(df: DataFrame, x: Column, y: Column, bits: Int): Column = {
    val r = df.agg(
      min(x).cast("double"), max(x).cast("double"),
      min(y).cast("double"), max(y).cast("double")).head
    val top = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(top),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top + 1.0)).cast("long"))
    zValue(
      norm(x, r.getDouble(0), r.getDouble(1)),
      norm(y, r.getDouble(2), r.getDouble(3)), bits)
  }

  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
                    nFiles: Int, path: String): Unit = {
    // empty input: min/max come back NULL and getDouble NPEs with a
    // useless message — write the empty frame (schema preserved) instead
    if (df.isEmpty) { df.write.mode("overwrite").parquet(path); return }
    df.withColumn("_z", normalizedZ(df, x, y, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** The skew-robust write: keys are mapped to approximate QUANTILE
    * ranks before interleaving (equal-mass cells) instead of min/max
    * positions (equal-width cells). Under a heavy-tailed key, min/max
    * normalization collapses — the head of the distribution lands in
    * one curve cell, the interleave degenerates to the other key, and
    * point predicates on hot values scan every file. Rank normalization
    * keeps cells equal-MASS, so skipping holds under the data's own
    * query distribution. Cuts come from one `approx_percentile` agg
    * (tiny result to the driver, shipped back as a literal array); the
    * per-row rank is a fold over the 2^bits-1 cuts — interpreted HOF,
    * fine for a write path, keep `bits` ≤ 7.
    */
  def writeZOrderedByRank(df: DataFrame, x: Column, y: Column, bits: Int,
                          nFiles: Int, path: String): Unit = {
    require(bits <= 8, s"rank cells are 2^$bits cuts per dim — keep bits <= 8")
    // same empty-input guard as writeZOrdered: approx_percentile of an
    // empty frame is NULL and getSeq NPEs
    if (df.isEmpty) { df.write.mode("overwrite").parquet(path); return }
    val nCells = 1 << bits
    val probs = (1 until nCells).map(_.toDouble / nCells)
    def cuts(c: Column): Seq[Double] = {
      val arr = df.agg(percentile_approx(c.cast("double"),
        array(probs.map(lit): _*), lit(10000))).head.getSeq[Double](0)
      arr
    }
    def rank(c: Column, cs: Seq[Double]): Column =
      size(filter(array(cs.map(lit): _*), e => e <= c.cast("double"))).cast("long")
    val (cx, cy) = (cuts(x), cuts(y))
    df.withColumn("_z", zValue(rank(x, cx), rank(y, cy), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected number of files scanned by a point predicate on `c`,
    * measured against the DATA distribution: for each sampled actual
    * value, count the files whose [min, max] contains it. The honest
    * skipping metric under skew — span sums weight the tail's huge
    * ranges equally with the head's hot values. Driver-side, test-only.
    */
  def expectedFilesScanned(df: DataFrame, c: Column, sample: Int = 200): Double = {
    val boxes = df.withColumn("_f", input_file_name())
      .groupBy(col("_f")).agg(min(c).as("lo"), max(c).as("hi"))
      .select(col("lo").cast("double"), col("hi").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val vals = df.select(c.cast("double")).limit(sample).collect().map(_.getDouble(0))
    vals.map(v => boxes.count { case (lo, hi) => lo <= v && v <= hi }.toDouble)
      .sum / math.max(vals.length, 1)
  }

  /** Per-dimension sums of per-file min/max spans — the data-skipping
    * metric. A selective predicate on a key scans the files whose span
    * contains the value, so expected-files-scanned for a uniform point
    * query on x is sumXSpan / xRange (likewise y). Single-key layouts
    * minimize one sum and leave the other at nFiles × fullRange; the
    * curve layout shrinks both. Driver-side only in tests.
    */
  def spanSums(df: DataFrame, x: Column, y: Column): (Double, Double) = {
    val r = df.withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(
        (max(x) - min(x)).cast("double").as("xs"),
        (max(y) - min(y)).cast("double").as("ys"))
      .agg(sum(col("xs")), sum(col("ys"))).head
    (r.getDouble(0), r.getDouble(1))
  }
}
