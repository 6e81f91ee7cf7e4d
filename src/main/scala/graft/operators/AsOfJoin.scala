package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: each left row picks up the payload of
  * the LATEST right row with `rightTs ≤ leftTs` for the same key — the
  * canonical time-series enrichment (tick → last completed daily candle,
  * trade → last quote).
  *
  * Spark lacks the operator; per the extension preference order this is
  * the COMPOSITIONAL implementation (a): union both sides tagged, then
  * ONE `last(struct(payload…), ignoreNulls)` running window over (key)
  * ORDER BY (ts, tag). Cost: ONE shuffle on key + one sorted pass — the
  * same price as a single window aggregate, with no range-join explosion
  * (a naive `leftTs >= rightTs` theta join is O(n·m) per key).
  *
  * The payload travels as one STRUCT, not per-column fills: a struct of
  * all-null fields is still non-null, so the window picks the matched
  * (latest) right ROW atomically and returns its values nulls-and-all —
  * per-column `last(_, ignoreNulls)` would silently backfill a null field
  * from an OLDER right row and could stitch one output row from several
  * right rows. This matches DuckDB ASOF JOIN exactly.
  *
  * Tie semantics: right rows sort before left rows at equal timestamps,
  * so a right row taking effect exactly at `leftTs` IS visible — matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses.
  */
object AsOfJoin {

  def asofLeftJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val rightSide = right.select(
      col(key), col(rightTs).as("_asof_ts"), lit(0).as("_asof_tag"),
      struct(payloadCols.map(col): _*).as("_asof_p"))
    val leftSide = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_tag", lit(1))
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("_asof_p", last(col("_asof_p"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"_asof_p.$c"))
    }
      .filter(col("_asof_tag") === 1)
      .drop("_asof_ts", "_asof_tag", "_asof_p")
  }
}
