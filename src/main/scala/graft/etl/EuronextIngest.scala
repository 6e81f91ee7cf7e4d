package graft.etl

import graft.ingest.Normalize
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's Euronext daily-export ingest path
  * (`etl/etl.py:499-567` load_euronext_file): tab-separated CSV with
  * malformed lines skipped, header canonicalization through a rename map,
  * SRD name strip, junk-char price/volume cleanup, free-text market → id,
  * event date from the file NAME, junk-row filter. One declarative plan
  * per directory of files — no per-file Python loop.
  */
object EuronextIngest {

  /** raw header → canonical name (`etl/etl.py:514-524`) */
  val headerMap: Map[String, String] = Map(
    "Symbol" -> "symbol", "Name" -> "name", "Last" -> "last",
    "last Price" -> "last", "Volume" -> "volume", "ISIN" -> "isin",
    "Market" -> "market")

  val rawSchema: StructType = StructType(Seq(
    StructField("Symbol", StringType), StructField("Name", StringType),
    StructField("Last", StringType), StructField("Volume", StringType),
    StructField("ISIN", StringType), StructField("Market", StringType)))

  /** Read + canonicalize one directory of Euronext exports. Output:
    * (symbol, name, isin, last, volume, mid, date) with junk rows
    * (`last <= 0 or volume <= 0`) dropped — `etl/etl.py:534-535`.
    */
  def ingest(spark: SparkSession, dir: String): DataFrame =
    canonicalize(
      Sources.dirtyCsv(spark, dir, rawSchema),
      org.apache.spark.sql.functions.input_file_name())

  /** Same canonicalization over `.xlsx` exports (S3 — `etl/etl.py:
    * 510-511` `pd.read_excel` branch of the same loader; identical
    * logical schema, so the CSV path's entire normalize chain is reused
    * verbatim).
    */
  def ingestXlsx(spark: SparkSession, dir: String): DataFrame =
    canonicalize(
      graft.sources.Xlsx.read(spark, dir, rawSchema.fieldNames.toSeq),
      col("path"))

  /** rename map + SRD strip + dirty price/volume cleanup + market id +
    * filename date + junk-row filter — shared by the CSV and XLSX routes
    */
  private def canonicalize(
      raw: DataFrame,
      pathCol: org.apache.spark.sql.Column): DataFrame = {
    val renamed = headerMap.foldLeft(raw) { case (df, (from, to)) =>
      if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
    renamed
      .withColumn("name", Normalize.stripSrd(col("name")))
      .withColumn("last", Normalize.cleanPriceEuronext(col("last")))
      .withColumn("volume", Normalize.cleanVolumeEuronext(col("volume")))
      .withColumn("mid", Normalize.marketIdFromText(coalesce(col("market"), lit(""))))
      .withColumn("date", Normalize.fileDate(pathCol))
      .filter(col("last") > 0 && col("volume") > 0)
      .select("symbol", "name", "isin", "last", "volume", "mid", "date")
  }
}
