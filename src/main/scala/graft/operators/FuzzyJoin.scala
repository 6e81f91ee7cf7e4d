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
  * The gram guarantee needs max(len) ≥ q·(d+1); below that a pair can
  * be within distance d and share NO q-gram ('IBM' ~ 'IBN'). Short
  * strings therefore also emit LENGTH keys (`l:<n>`, mirroring
  * `FuzzyJoinRewrite.sideKeys`): the left side emits len−d … len+d, the
  * right side its own length, so a short-short pair meets iff
  * |Δlen| ≤ d — a necessary condition for distance ≤ d. Mixed pairs
  * (one short, one ≥ q·(d+1)) are covered by the gram keys: the longer
  * side has > d·q grams, an edit destroys at most q, so a surviving
  * gram is shared. Together the key sets lose NO true match at any
  * length.
  *
  * Skew: ultra-common trigrams ("LLC", "SA ") are the hot keys;
  * `maxGramDf` drops grams blocking more than that many right-side rows
  * (they carry no discriminating signal — same policy as
  * `Dedup.hotShingleMaxDf`). Candidates they would have contributed are
  * covered by the match's OTHER, rarer grams except for degenerate
  * all-boilerplate names. Length keys are never df-capped — capping
  * them would silently reopen the short-string hole.
  */
object FuzzyJoin {

  /** Blocking keys for one side: `g:<gram>` for strings ≥ q chars, plus
    * `l:<len>` keys when len < q·(d+1) (left fans out ±d, right emits
    * its own length — each short pair meets on exactly the left key
    * matching the right's length). NULL names emit no keys (inner
    * null-rejecting semantics). */
  private def keys(df: DataFrame, key: String, name: String, q: Int, d: Int,
                   isLeft: Boolean): DataFrame = {
    val thresh = q * (d + 1)
    val gramArr =
      s"""CASE WHEN length($name) >= $q
            THEN transform(array_distinct(transform(sequence(1, length($name) - ${q - 1}),
                                                    i -> substring($name, i, $q))),
                           g -> concat('g:', g))
            ELSE CAST(array() AS array<string>) END"""
    val lenArr =
      if (isLeft)
        s"""CASE WHEN length($name) < $thresh
              THEN transform(sequence(${-d}, $d),
                             dl -> concat('l:', cast(length($name) + dl AS string)))
              ELSE CAST(array() AS array<string>) END"""
      else
        s"""CASE WHEN length($name) < $thresh
              THEN array(concat('l:', cast(length($name) AS string)))
              ELSE CAST(array() AS array<string>) END"""
    df.select(col(key), col(name))
      .withColumn("bkey", explode(expr(s"array_union($gramArr, $lenArr)")))
      .select(col(key), col("bkey"))
  }

  /** Best match per left row: (leftKey, rightKey, dist), dist <= maxDist,
    * ties broken by (dist, rightKey). Left rows with no candidate within
    * the distance are absent (inner semantics — the caller left-joins
    * back if unmatched rows must surface).
    */
  /** Blocked candidate pairs CONFIRMED at `levenshtein ≤ maxDist`, with
    * both name columns and `dist` kept — the seam re-ranking passes
    * (e.g. Jaro-Winkler scoring) build on, so the expensive
    * block-and-verify stage is shared, never re-derived.
    */
  def scoredCandidates(left: DataFrame, leftKey: String, leftName: String,
                       right: DataFrame, rightKey: String, rightName: String,
                       maxDist: Int = 2, q: Int = 3, maxGramDf: Long = 1000L): DataFrame = {
    val lg = keys(left, leftKey, leftName, q, maxDist, isLeft = true)
    val rg0 = keys(right, rightKey, rightName, q, maxDist, isLeft = false)
    val rg =
      if (maxGramDf <= 0) rg0
      else {
        val keep = rg0.filter(col("bkey").startsWith("g:"))
          .groupBy("bkey").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxGramDf).select("bkey")
        rg0.filter(col("bkey").startsWith("l:"))
          .unionByName(rg0.join(keep, Seq("bkey")))
      }
    val cands = lg.join(rg, Seq("bkey"))
      .select(col(leftKey), col(rightKey)).distinct()
    cands
      .join(left.select(col(leftKey), col(leftName)), Seq(leftKey))
      .join(right.select(col(rightKey), col(rightName)), Seq(rightKey))
      // bounded form: banded O(len·d) DP that bails out at maxDist+1
      // (returns -1 above the bound) instead of the full O(len²) matrix —
      // the confirm step runs once per candidate pair, so the band is
      // where the blocked join's verify cost lives
      .withColumn("dist", levenshtein(col(leftName), col(rightName), maxDist))
      .filter(col("dist") >= 0)
  }

  def bestMatch(left: DataFrame, leftKey: String, leftName: String,
                right: DataFrame, rightKey: String, rightName: String,
                maxDist: Int = 2, q: Int = 3, maxGramDf: Long = 1000L): DataFrame = {
    val scored = scoredCandidates(left, leftKey, leftName,
      right, rightKey, rightName, maxDist, q, maxGramDf)
    val w = Window.partitionBy(col(leftKey)).orderBy(col("dist"), col(rightKey))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(leftKey), col(rightKey), col("dist").cast("long").as("dist"))
  }
}
