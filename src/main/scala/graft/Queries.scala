package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver replays over the
  * same parquet tables.
  *
  * Conventions that make the driver's DuckDB hash-compare deterministic
  * (SURVEY.md §7.4, FIXTURES.md §3):
  *  - every query ends in a total ORDER BY (unique key prefix);
  *  - every floating aggregate is `round(x, 4)` in BOTH engines
  *    (kills last-ulp summation-order differences);
  *  - integer-ish outputs are cast to BIGINT in both engines
  *    (DuckDB `year()`/`count()` are BIGINT, Spark's are INT/LONG);
  *  - order-sensitive first/last use `min_by/max_by(value, ts)` — event
  *    timestamps are globally unique in the testdata, so ties cannot
  *    occur (verified at sf0.001/0.01/0.1).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
