package graft.sources

import graft.ingest.Normalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-source operators (SURVEY.md §2.1):
  *  - S2 dirty CSV scan with malformed-line dropping
  *    (`etl/etl.py:507-509` pd.read_csv on_bad_lines='skip');
  *  - S5 filename-embedded event dates + date-range pruning BEFORE IO
  *    (`etl/etl.py:619-649` — the reference's whole "query planner");
  *  - S6 partitioned warehouse sink (the COPY-bulk-load analog,
  *    `etl/timescaledb_model.py:29-57`).
  *
  * The reference's pickle source (S1) has no Spark analog by design — the
  * engine's landed format is Parquet (SURVEY.md §2.1 S1); XLSX (S3) shares
  * S2's logical schema and is out of scope.
  */
object Sources {

  /** Tab-separated CSV with ragged/malformed lines dropped — Euronext
    * export shape.
    *
    * Caveat: DROPMALFORMED only drops a row when a malformed column is
    * actually READ — under column pruning (e.g. a bare count()) no values
    * are parsed and nothing is dropped. Select the typed columns you
    * depend on before counting.
    */
  def dirtyCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(path)

  /** JSON-lines scan with corrupt-record quarantine: well-formed rows
    * parse against the explicit schema; malformed lines land whole in
    * `_corrupt` (PERMISSIVE + columnNameOfCorruptRecord) so ingest can
    * count/route them instead of silently dropping — the JSONL analog of
    * `dirtyCsv`, for the modern lake-landing format the reference
    * pre-dates.
    *
    * Same caveat as dirtyCsv: corrupt-record capture requires the
    * corrupt column (or a parsed column) to be SELECTED; a bare count()
    * over pruned columns parses nothing.
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .json(path)

  /** Attach the event date parsed from each input file's NAME and prune to
    * [start, end]. With date-partitioned layouts Catalyst turns the same
    * predicate into partition pruning; for filename-dated flat dirs this
    * keeps the reference's prune-before-work behavior (file groups whose
    * rows all fail the filter short-circuit after the cheap regex).
    */
  def withFileDate(df: DataFrame): DataFrame =
    df.withColumn("file_date", Normalize.fileDate(input_file_name()))

  def pruneByFileDate(df: DataFrame, start: String, end: String): DataFrame =
    withFileDate(df).filter(col("file_date").between(lit(start), lit(end)))

  /** Day-partitioned Parquet warehouse write — the hypertable analog
    * (`etl/timescaledb_model.py:281-283`): time-partitioned layout gives
    * partition pruning on date predicates; `sortWithinPartitions` by
    * (key, ts) is the substitute for the reference's (cid, date DESC)
    * composite index (min/max row-group skipping).
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, keyCol: String, path: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .repartition(col("day"))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(path)
}
