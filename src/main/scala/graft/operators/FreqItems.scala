package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters summary as a typed Aggregator — the
  * mergeable-summaries formulation (Agarwal et al., PODS'12): `reduce`
  * is the classic k-counter update; `merge` adds counter maps then
  * subtracts the (k+1)-th largest count from every counter and drops the
  * non-positives, which preserves the error bound under ANY partial-
  * aggregation tree. Guarantees after a stream of n items:
  *  - every item with true count > n/(k+1) is PRESENT in the summary;
  *  - each kept estimate undercounts by at most n/(k+1), never over.
  *
  * Scale shape: per-partition state is one O(k) map regardless of
  * partition size, and only the k-entry maps shuffle to the final merge
  * — the exact groupBy it replaces shuffles every distinct item. The
  * summary's counts are order-dependent (not deterministic across
  * partitionings), so the driver-facing operator below never emits them:
  * it uses the sketch only as a CANDIDATE SET (complete by the first
  * guarantee) and exact-counts the ≤ k candidates in a second pass with
  * an isin-pushed filter — deterministic, oracle-checkable output.
  */
class FreqItemsAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all; amortized O(1) per item over the stream
        buf.collect { case (w, c) if c > 1 => w -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep positives (≤ k remain)
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
}

/** The sketch plus the stream length in ONE buffer — `n` is a by-product
  * of the same pass, so `heavyHitters` never pays a separate `count()`
  * scan over what is by definition a full-corpus input. */
private class FreqItemsWithCount(k: Int)
    extends Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {
  private val mg = new FreqItemsAggregator(k)
  override def zero: (Map[String, Long], Long) = (mg.zero, 0L)
  override def reduce(b: (Map[String, Long], Long), x: String): (Map[String, Long], Long) =
    (mg.reduce(b._1, x), b._2 + 1)
  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) =
    (mg.merge(a._1, b._1), a._2 + b._2)
  override def finish(r: (Map[String, Long], Long)): (Map[String, Long], Long) = r
  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]
  override def outputEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]
}

object FreqItems {

  /** The raw sketch over a single string column (diagnostics / tests).
    * Nulls are excluded — SQL aggregate semantics, and the guarantee's n
    * must equal the counted stream length. */
  def sketch(items: DataFrame, column: String, k: Int): Map[String, Long] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(column).cast("string")).filter(col(column).isNotNull).as[String]
      .select(new FreqItemsAggregator(k).toColumn)
      .head()
  }

  /** Exact heavy hitters (true count × (k+1) > n) via the two-pass
    * sketch-then-confirm plan: pass 1 builds the O(k) summary (complete
    * candidate set — no false negatives above the threshold) AND the
    * stream length n in the same buffer; pass 2 exact-counts only the
    * ≤ k candidates behind an `isin` filter that pushes into the scan,
    * so the shuffle carries ≤ k distinct keys. Output (item, cnt) is
    * exact and deterministic — the sketch decides only WHAT gets
    * counted, never the counts.
    */
  def heavyHitters(items: DataFrame, column: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val (summary, n) = items.select(col(column).cast("string"))
      .filter(col(column).isNotNull).as[String]
      .select(new FreqItemsWithCount(k).toColumn)
      .head()
    val cands = summary.keys.toSeq
    if (cands.isEmpty)
      return items.sparkSession.emptyDataFrame
        .withColumn("item", lit("")).withColumn("cnt", lit(0L)).limit(0)
    items.select(col(column).cast("string").as("item"))
      .filter(col("item").isin(cands: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
  }
}
