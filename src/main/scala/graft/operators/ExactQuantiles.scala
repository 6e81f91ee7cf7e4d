package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-engine EXACT interpolated quantiles (r14 whitelist conversion).
  *
  * `quantile_cont` (DuckDB) and `percentile` (Spark) agree on the
  * DEFINITION — rank rn = p·(n−1) over the sorted non-null values,
  * linear interpolation between the two bracketing order statistics —
  * but not on the FORMULA: one computes lo·(hi−rn)+hi·(rn−lo), the
  * other lo+frac·(hi−lo), which differ in the last ulp whenever the
  * bracketing values are not exactly representable (any cent-grid
  * price). That 1-ulp class is what kept mad_stats / time_to_convert /
  * value_quantiles / winsorize_stats on the DeterminismAudit
  * floatOutputWhitelist as ARGUED rows.
  *
  * This helper removes the argument by computing the quantile from
  * first principles with ONE shared formula in both engines:
  *
  *   rk  = row_number() over (partition by keys order by v) − 1
  *   rn  = p·(n−1)            -- identical double: p is the same
  *                            -- literal, n the same BIGINT
  *   a,b = the values at ranks floor(rn) / ceil(rn)  -- exact row
  *                            -- selection, no arithmetic at all
  *   q   = a + (rn − floor(rn)) · (b − a)   -- SAME expression text
  *                            -- both sides: identical IEEE operands
  *                            -- through identical operations give
  *                            -- bit-identical doubles
  *
  * Ties in the ORDER BY are harmless: row_number permutes tied ROWS,
  * but the VALUE at a given rank of the sorted multiset is unique, so
  * a and b are deterministic under any partitioning. Nulls are
  * excluded before ranking (both built-ins ignore them; Spark and
  * DuckDB disagree on default null ORDER placement, so the filter is
  * also what makes ranks line up).
  *
  * Scale shape: one window (rank + count) and one hash-agg, both keyed
  * by the group columns — the same shuffle key the built-in percentile
  * aggregation uses, but with an external-sortable window instead of
  * percentile's in-memory per-group value buffer. At 100 TB the swap
  * is approx_percentile (different contract); this operator is the
  * exact tier.
  */
object ExactQuantiles {

  /** Per-group exact quantiles: one output row per distinct `keys`
    * combination present in `df` (rows with null `valueCol` contribute
    * nothing), with one double column per (alias, p) in `ps`.
    */
  def perGroup(df: DataFrame, keys: Seq[String], valueCol: String,
               ps: Seq[(String, Double)]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("_v"))
    val wc = Window.partitionBy(kc: _*)
    val r = df.filter(col(valueCol).isNotNull)
      .select(kc :+ col(valueCol).cast("double").as("_v"): _*)
      .withColumn("_rk", (row_number().over(w) - 1).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(wc))
    val withRn = ps.foldLeft(r) { case (d, (a, p)) =>
      d.withColumn(s"_rn_$a", lit(p) * (col("_cnt") - 1))
    }
    val aggs: Seq[Column] = ps.flatMap { case (a, _) => Seq(
      min(col(s"_rn_$a")).as(s"_rn_$a"),
      min(when(col("_rk") === floor(col(s"_rn_$a")), col("_v"))).as(s"_a_$a"),
      min(when(col("_rk") === ceil(col(s"_rn_$a")), col("_v"))).as(s"_b_$a"))
    }
    val g = withRn.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
    val out = ps.map { case (a, _) =>
      (col(s"_a_$a") +
        (col(s"_rn_$a") - floor(col(s"_rn_$a"))) * (col(s"_b_$a") - col(s"_a_$a"))).as(a)
    }
    g.select(kc ++ out: _*)
  }

  /** Shortest-roundtrip SQL double literal (`0.05e0`): the `e0` suffix
    * forces DOUBLE in DuckDB, whose bare decimal literals are DECIMAL —
    * decimal arithmetic there would diverge from Spark's double rn.
    */
  private def dlit(p: Double): String = s"${p}e0"

  /** The DuckDB mirror of [[perGroup]] as a self-contained SELECT
    * (wrap as a CTE body or subquery): same ranks, same interpolation
    * expression text, so every operand is the identical double.
    * `src` may be a table name or a parenthesized subquery with alias.
    */
  def oracleSql(src: String, keys: Seq[String], valueCol: String,
                ps: Seq[(String, Double)]): String = {
    val k = keys.mkString(", ")
    val rnDefs = ps.map { case (a, p) =>
      s"${dlit(p)} * (_cnt - 1) AS _rn_$a"
    }.mkString(",\n                 ")
    val aggDefs = ps.flatMap { case (a, _) => Seq(
      s"min(_rn_$a) AS _rn_$a",
      s"min(CASE WHEN _rk = CAST(floor(_rn_$a) AS BIGINT) THEN _v END) AS _a_$a",
      s"min(CASE WHEN _rk = CAST(ceil(_rn_$a) AS BIGINT) THEN _v END) AS _b_$a")
    }.mkString(",\n                 ")
    val outs = ps.map { case (a, _) =>
      s"_a_$a + (_rn_$a - floor(_rn_$a)) * (_b_$a - _a_$a) AS $a"
    }.mkString(",\n                 ")
    s"""SELECT $k, $outs
       |FROM (
       |  SELECT $k, $aggDefs
       |  FROM (
       |    SELECT $k, _v, _rk, $rnDefs
       |    FROM (
       |      SELECT $k, CAST($valueCol AS DOUBLE) AS _v,
       |             row_number() OVER (PARTITION BY $k ORDER BY $valueCol) - 1 AS _rk,
       |             count(*) OVER (PARTITION BY $k) AS _cnt
       |      FROM $src WHERE $valueCol IS NOT NULL
       |    ) _q_ranked
       |  ) _q_rn
       |  GROUP BY $k
       |) _q_stats""".stripMargin
  }
}
