package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy (approximate-string) join — the scalable
  * entity-resolution shape. The reference resolves identities EXACTLY
  * (symbol/ISIN equality, `etl/etl.py:272-299`); real dirty sources also
  * need "PÉTROLE SA" ≈ "PETROLE SA". The naive formulation is a
  * cartesian `levenshtein(a, b) <= d` — O(|L|·|R|) comparisons; this
  * operator gets the same answer from q-gram BLOCKING: strings within
  * edit distance d share at least one q-gram once lengths pass
  * q·(d+1) — with q=3, d<=2, any true match shares a trigram (each edit
  * destroys at most q grams). So candidates come from a trigram
  * equi-join (work ∝ shared trigrams, shuffled by trigram key), and the
  * expensive edit distance runs only on candidates.
  *
  * Skew: ultra-common trigrams ("LLC", "SA ") are the hot keys;
  * `maxGramDf` drops grams blocking more than that many right-side rows
  * (they carry no discriminating signal — same policy as
  * `Dedup.hotShingleMaxDf`). Candidates they would have contributed are
  * covered by the match's OTHER, rarer grams except for degenerate
  * all-boilerplate names.
  */
object FuzzyJoin {

  private def grams(df: DataFrame, key: String, name: String, q: Int): DataFrame =
    df.select(col(key), col(name))
      .withColumn("gram", explode(expr(
        s"""CASE WHEN length($name) >= $q
              THEN array_distinct(transform(sequence(1, length($name) - ${q - 1}),
                                            i -> substring($name, i, $q)))
              ELSE array($name) END""")))
      .select(col(key), col("gram"))

  /** Best match per left row: (leftKey, rightKey, dist), dist <= maxDist,
    * ties broken by (dist, rightKey). Left rows with no candidate within
    * the distance are absent (inner semantics — the caller left-joins
    * back if unmatched rows must surface).
    */
  def bestMatch(left: DataFrame, leftKey: String, leftName: String,
                right: DataFrame, rightKey: String, rightName: String,
                maxDist: Int = 2, q: Int = 3, maxGramDf: Long = 1000L): DataFrame = {
    val lg = grams(left, leftKey, leftName, q)
    val rg0 = grams(right, rightKey, rightName, q)
    val rg =
      if (maxGramDf <= 0) rg0
      else {
        val keep = rg0.groupBy("gram").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxGramDf).select("gram")
        rg0.join(keep, Seq("gram"))
      }
    val cands = lg.join(rg, Seq("gram"))
      .select(col(leftKey), col(rightKey)).distinct()
    val scored = cands
      .join(left.select(col(leftKey), col(leftName)), Seq(leftKey))
      .join(right.select(col(rightKey), col(rightName)), Seq(rightKey))
      .withColumn("dist", levenshtein(col(leftName), col(rightName)))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy(col(leftKey)).orderBy(col("dist"), col(rightKey))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(leftKey), col(rightKey), col("dist").cast("long").as("dist"))
  }
}
