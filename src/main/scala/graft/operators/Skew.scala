package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys (SCALE.md): two-phase
  * salted aggregation. Phase 1 aggregates on (key, salt) — spreading one
  * hot key over `nSalts` reducers — phase 2 merges the partials on key.
  *
  * The salt is DETERMINISTIC (`pmod(hash(saltSource), nSalts)`, not
  * rand()) so the operator stays reproducible and retry-safe (a rand()
  * salt re-rolls on task retry and can double-count with speculative
  * execution).
  *
  * AQE's skew-join splitting covers joins; this covers aggregations whose
  * partial state is decomposable (sum/count/min/max — anything with an
  * associative merge).
  */
object Skew {

  /** count + sum(valueCol) per key, salted. Equivalent to
    * `df.groupBy(key).agg(count, sum)` for any data; worth the extra
    * stage only when some key dominates.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltSource: String,
      nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(saltSource)), lit(nSalts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }
}
