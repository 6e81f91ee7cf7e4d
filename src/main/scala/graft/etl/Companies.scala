package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Company-dimension maintenance (reference `__process_companies`,
  * `etl/etl.py:229-308`): dedup incoming rows by key, find keys not yet in
  * the dimension (anti join), assign dense increasing ids, and resolve
  * identity drift through a stable secondary key (ISIN) with
  * last-writer-wins updates (`etl/etl.py:272-280`).
  *
  * Scale notes (SURVEY.md §7.4 item 1): the dense-id `row_number` runs on an
  * unpartitioned window, but only over the NEW-keys set — post-anti-join
  * this is thousands of rows, not the full stream, so the single-task sort
  * is bounded. For a truly unbounded key space switch to
  * `monotonically_increasing_id` (sparse ids) — kept dense here because the
  * reference's ids are dense and the oracle checks them.
  */
object Companies {

  /** Deterministic "keep first" dedup: the reference keeps the first
    * occurrence in file order (`etl/etl.py:231, 254`); with no global order
    * at scale we keep the row with the smallest `orderCol` per key.
    */
  def dedupKeepFirst(df: DataFrame, key: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** New keys = incoming − existing (reference set difference,
    * `etl/etl.py:282-290`). Broadcast the existing-dimension side when
    * small; Catalyst picks broadcast automatically under the threshold.
    */
  def newKeys(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing, Seq(key), "left_anti")

  /** Dense id assignment for new rows: maxExistingId + row_number ordered
    * by `key` (reference `np.arange(next_id, next_id+n)`,
    * `etl/etl.py:292-299`).
    */
  def assignDenseIds(newRows: DataFrame, key: String, maxExistingId: Long, idCol: String = "id"): DataFrame =
    newRows.withColumn(
      idCol,
      row_number().over(Window.orderBy(col(key))) + lit(maxExistingId))

  /** Last-writer-wins attribute resolution per id: emulates the reference's
    * in-run `UPDATE companies SET name,symbol WHERE id` when an ISIN
    * reappears under a new symbol (`etl/etl.py:272-280`) as a single
    * aggregation: for each key take every attribute from the row with the
    * greatest `versionCol`.
    */
  def lastWriterWins(df: DataFrame, key: String, versionCol: String, attrs: Seq[String]): DataFrame =
    df.groupBy(col(key))
      .agg(
        max_by(struct(attrs.map(col): _*), col(versionCol)).as("_last"),
        max(col(versionCol)).as(versionCol))
      .select(col(key) +: attrs.map(a => col(s"_last.$a").as(a)) :+ col(versionCol): _*)
}
