package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver replays over the
  * same parquet tables.
  *
  * Conventions that make the driver's DuckDB hash-compare deterministic
  * (SURVEY.md §7.4, FIXTURES.md §3):
  *  - every query ends in a total ORDER BY — and "total" must be proven
  *    against the DATA, not assumed from column names: the testdata's
  *    (l_orderkey, l_linenumber) is NOT unique (143k duplicate pairs at
  *    sf0.1), which let two entries pass small SFs on lucky tie order
  *    and diverge at sf1 (r11 sweep). When in doubt, extend the sort
  *    with the value columns — deterministic up to fully-identical
  *    rows, which hash equal under any order;
  *  - a STRICT comparison against a float aggregate (value < percentile
  *    threshold) flips on 1-ulp cross-engine interpolation differences
  *    that the float tolerance hides — derive such thresholds so both
  *    engines compute the IDENTICAL double: exact fixed-point means
  *    (cents sum / 100 / n), and order statistics through
  *    `graft.operators.ExactQuantiles` (explicit rank selection + one
  *    shared interpolation formula; never bare quantile_cont /
  *    percentile, whose last-ulp formulas differ) — r11's 1e-6 grid
  *    rounding was a mitigation, r14 made the operands identical;
  *  - every floating aggregate is `round(x, 4)` in BOTH engines
  *    (kills last-ulp summation-order differences) — but round() is a
  *    MITIGATION, not a proof: a group whose unrounded value drifts
  *    across a rounding boundary still flips the last digit
  *    (interval_join_agg at sf1, 1 of 26k groups over a 42.9M-value
  *    match stream). Aggregations over UNBOUNDED or join-product
  *    streams must use the exact quantized form instead —
  *    `sum(cast(round(v*10000) as bigint)) / 10000.0 / count(*)` —
  *    which has no boundary at all;
  *  - integer-ish outputs are cast to BIGINT in both engines
  *    (DuckDB `year()`/`count()` are BIGINT, Spark's are INT/LONG);
  *  - order-sensitive first/last use `min_by/max_by(value, ts)` — event
  *    timestamps are globally unique in the testdata, so ties cannot
  *    occur (verified at sf0.001/0.01/0.1).
  *
  * The first three classes are enforced MECHANICALLY over the whole
  * catalog by [[DeterminismAudit]] (ORDER-BY-prefix uniqueness probed
  * against the sf0.01 AND sf0.1 data; strict-float comparisons and
  * float-aggregate output columns walked out of the oracle SQL, the
  * latter cross-checked against the Spark output schema) — run it when
  * adding an entry. Every entry
  * also needs a ≥sf1 correctness signal: the sf1 oracle sweep if its
  * oracle is feasible there (tools/probe_sf1_oracles.py decides), a
  * planted invariant in [[ScaleInvariants]] otherwise
  * (tools/sf1_signal_r12.json is the per-entry ledger).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Tail idioms for the determinism ORDER BY every catalog query carries.
  *
  * A bare `orderBy` on a computed tail plans Exchange(rangepartitioning),
  * and the range boundaries come from a SAMPLING JOB over the child —
  * which re-executes the child's FINAL stage (shuffle outputs below it
  * are reused across the two jobs; the result-stage computation is not).
  * For a query whose last stage is the expensive part that doubles the
  * whole query: measured 5.9 s → 2.2 s on price_parse (fat projection)
  * and ~2× on fuzzy_join_rule / dedup_scrub_spans (post-shuffle
  * join/agg tails) at sf0.1.
  *
  * Two fixes, by result size:
  *  - SMALL (oracle-sized) result → [[Tails.orderedSmall]]: one
  *    round-robin shuffle of the already-small output into a single
  *    sorted partition — no sampling job, total order preserved. NOT for
  *    fat outputs (a single partition would serialize them).
  *  - FAT row-level result → sort the NARROW input first, project the
  *    expensive columns AFTER the sort (projection is order-preserving,
  *    and Catalyst does not push projects below sorts) — the sampling
  *    job then only re-reads the cheap scan. See `price_parse`.
  */
object Tails {
  def orderedSmall(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Curried form for `.transform(Tails.ordSmall("a", "b"))` tails. */
  def ordSmall(cols: String*): DataFrame => DataFrame =
    df => orderedSmall(df, cols.map(org.apache.spark.sql.functions.col): _*)
}
