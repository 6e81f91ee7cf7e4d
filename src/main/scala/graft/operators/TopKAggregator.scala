package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate for top-k selection. */
case class ScoredCand(score: Double, candId: Long)

/** Bounded top-k per group as a typed Aggregator (SURVEY.md §7.3 tool (b),
  * chosen over a custom SparkPlan (c) per the extension preference
  * order): each partial buffer holds AT MOST k candidates, so selecting
  * top-k per key costs O(n·log k) with O(k) state per group — the
  * window-function formulation (`row_number().over(orderBy(score))` +
  * filter) must instead SORT every group's full candidate list.
  *
  * Deterministic by construction: the ordering (score desc, candId asc)
  * is total (candId unique), and `merge` re-sorts the combined buffer, so
  * any partial-aggregation tree yields the same k items.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredCand, Seq[ScoredCand], Seq[ScoredCand]] {

  private val ord: Ordering[ScoredCand] =
    Ordering.by(c => (-c.score, c.candId))

  override def zero: Seq[ScoredCand] = Seq.empty

  override def reduce(buf: Seq[ScoredCand], x: ScoredCand): Seq[ScoredCand] = {
    // skip early when x can't displace the current k-th item
    if (buf.size >= k && ord.gteq(x, buf.last)) buf
    else (buf :+ x).sorted(ord).take(k)
  }

  override def merge(a: Seq[ScoredCand], b: Seq[ScoredCand]): Seq[ScoredCand] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[ScoredCand]): Seq[ScoredCand] = r
  override def bufferEncoder: Encoder[Seq[ScoredCand]] = Encoders.kryo[Seq[ScoredCand]]
  override def outputEncoder: Encoder[Seq[ScoredCand]] = Encoders.kryo[Seq[ScoredCand]]
}

object TopKAggregator {

  /** Top-k rows per key from (key, score, candId) without sorting whole
    * groups. Output: (key, candId, score, rank) with rank 1..k by
    * (score desc, candId asc).
    */
  def topKPerKey(scored: DataFrame, key: String, score: String, candId: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      // null scores are unrankable and cannot belong to any top-k — and a
      // null in the typed (key, score, cand) tuple is a hard
      // NOT_NULL_ASSERT_VIOLATION in the encoder (found by the degenerate
      // gauntlet: zero-vector cosines). Dropped, by contract.
      .filter(col(score).isNotNull)
      .select(col(key).cast("long").as("_k"),
        col(score).cast("double").as("score"),
        col(candId).cast("long").as("candId"))
      .as[(Long, Double, Long)]
      .map { case (kk, s, c) => (kk, ScoredCand(s, c)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (kk, top) =>
        top.zipWithIndex.map { case (c, i) => (kk, c.candId, c.score, (i + 1).toLong) }
      }
      .toDF(key, candId, score, "rank")
  }

  /** Same as `topKPerKey` for a STRING group key (e.g. a language code) —
    * grouping on the value itself instead of a hand-maintained value→code
    * mapping, which silently merged unknown keys into one group.
    */
  def topKPerStringKey(scored: DataFrame, key: String, score: String, candId: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      // null scores are unrankable and cannot belong to any top-k — and a
      // null in the typed (key, score, cand) tuple is a hard
      // NOT_NULL_ASSERT_VIOLATION in the encoder (found by the degenerate
      // gauntlet: zero-vector cosines). Dropped, by contract.
      .filter(col(score).isNotNull)
      .select(col(key).cast("string").as("_k"),
        col(score).cast("double").as("score"),
        col(candId).cast("long").as("candId"))
      .as[(String, Double, Long)]
      .map { case (kk, s, c) => (kk, ScoredCand(s, c)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (kk, top) =>
        top.zipWithIndex.map { case (c, i) => (kk, c.candId, c.score, (i + 1).toLong) }
      }
      .toDF(key, candId, score, "rank")
  }
}
