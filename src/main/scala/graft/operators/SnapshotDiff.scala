package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC between two table versions): one full-outer join
  * on the key classifies every row as insert / delete / update /
  * unchanged — the audit a warehouse runs after a backfill, a
  * reprocessing run, or an engine migration (pairs with
  * `table_checksum`: the checksum says WHETHER versions diverge, the
  * diff says WHERE).
  *
  * One shuffle on the key; value comparison is a single null-safe
  * struct equality over the non-key columns, so adding columns never
  * adds joins. Unchanged rows are dropped before any ordering, so
  * output ∝ churn, not table size.
  */
object SnapshotDiff {

  /** Returns (keyCols…, status, old_<c>/new_<c> for each non-key column
    * of `a`). `a` and `b` must share a schema; rows are matched by
    * `keyCols` (unique per snapshot).
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val valueCols = a.columns.filterNot(keyCols.contains).toSeq
    val oldSide = a.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("_in_a"): _*)
    val newSide = b.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("_in_b"): _*)
    val joined = oldSide.join(newSide, keyCols, "full_outer")
    val changed = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("status",
        when(col("_in_a").isNull, "insert")
          .when(col("_in_b").isNull, "delete")
          .when(changed, "update")
          .otherwise("same"))
      .filter(col("status") =!= "same")
      .drop("_in_a", "_in_b")
  }
}
