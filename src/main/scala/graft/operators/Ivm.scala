package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN and JOIN-AGGREGATE views — the
  * delta algebra that keeps a materialized view current without
  * recomputing it (the candle store covers single-table aggregates;
  * this covers the two-table case).
  *
  * Rows carry an integer weight column `_w` (+1 insert, −1 retract —
  * the z-set encoding): a bag is "each row with multiplicity Σ_w", so
  * UPDATES are a retract+insert pair and DELETES are just negative
  * weights, and every operator below is linear in its inputs. The
  * bilinear identity that makes joins incremental:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * with the joined weight = w_a · w_b (a retracted left row cancels
  * every pair it had formed). Decomposable aggregates over the view
  * (count, sum) then maintain as per-group weighted sums merged into
  * the state by addition; groups whose count reaches zero vanish.
  *
  * 100 TB shape: a maintenance step costs O(|Δ| × match fan-out) — the
  * delta joins probe the OLD sides by join key (partition-pruned /
  * bucketed / DPP-filtered reads in a real warehouse), never a full
  * V recompute, and the state merge is one hash-agg on the group key.
  * Correctness does not depend on delta batching: the spec proves any
  * chunking of the same deltas converges to the one-shot result, and a
  * delta followed by its negation restores the state EXACTLY (weights
  * are integers; sums are exact integer cents in the engine's
  * conventions).
  */
object Ivm {

  val W = "_w"

  /** Attach weight +1 to a plain relation. */
  def weighted(df: DataFrame): DataFrame = df.withColumn(W, lit(1L))

  /** The join delta under z-set semantics. Non-key columns of the two
    * sides must be disjoint (standard join hygiene); both inputs carry
    * `_w`, the output's `_w` is the product.
    */
  def joinDelta(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    def times(l: DataFrame, r: DataFrame): DataFrame = {
      val lw = l.withColumnRenamed(W, "_wa")
      val rw = r.withColumnRenamed(W, "_wb")
      lw.join(rw, keys).withColumn(W, col("_wa") * col("_wb")).drop("_wa", "_wb")
    }
    times(aDelta, bOld)
      .unionByName(times(aOld, bDelta))
      .unionByName(times(aDelta, bDelta))
  }

  /** Collapse a weighted relation to (groupKeys, cnt, sum_cents): the
    * maintained join-agg state. `cnt` is the weighted row count, `sum`
    * the weighted value sum in exact cents.
    */
  def aggState(rows: DataFrame, groupKeys: Seq[String], centsCol: String): DataFrame =
    rows.groupBy(groupKeys.map(col): _*)
      .agg(
        sum(col(W)).as("cnt"),
        sum(col(W) * col(centsCol)).as("sum_cents"))
      .filter(col("cnt") =!= 0 || col("sum_cents") =!= 0)

  /** Merge a delta's agg-state into the maintained state by addition;
    * groups that cancel to zero disappear (the view never accretes
    * tombstones).
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, groupKeys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_cents")).as("sum_cents"))
      .filter(col("cnt") =!= 0 || col("sum_cents") =!= 0)

  /** One full maintenance step for a join-agg view: state' = state ⊕
    * γ(Δ(A ⋈ B)). Returns the new state.
    */
  def maintainJoinAgg(
      state: DataFrame,
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      joinKeys: Seq[String], groupKeys: Seq[String], centsCol: String): DataFrame =
    mergeAggState(state,
      aggState(joinDelta(aOld, aDelta, bOld, bDelta, joinKeys), groupKeys, centsCol),
      groupKeys)
}
