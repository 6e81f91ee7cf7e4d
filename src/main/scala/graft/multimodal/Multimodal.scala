package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. At 100 TB the
  * payload column lives in Parquet as `binary` (or as object-store URIs
  * resolved at read time); metadata stays queryable columns.
  */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted per-item features. `decoded_ok` marks items the (stubbed)
  * codec accepted.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    header_hex: String,
    n_frames: Long,
    mean_byte: Double,
    decoded_ok: Boolean)

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * processed batch-wise with `mapPartitions` (the Scala analog of a
  * Pandas-UDF batch loop: one iterator per partition, codec state
  * initialized once per partition, rows streamed through).
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake features from the raw bytes.
  * The Spark-side plumbing (schema, binary handling, partition-batched
  * UDF shape, feature schema) is real and tested; swap `decodeStub` for a
  * JNI/codec call in production.
  */
object Multimodal {

  /** Wrap documents as media rows: payload = UTF-8 bytes of the text,
    * media_type derived from the source tag. Stands in for reading a
    * `binary` Parquet column of real image/audio bytes.
    */
  def asMedia(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        concat(lit("image/fake-"), col("source")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB codec: deterministic pseudo-decode of a payload.
    * Real implementation would invoke an image/audio library here.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (String, Long, Double, Boolean) = {
    if (payload == null || payload.isEmpty) ("", 0L, 0.0, false)
    else {
      val header = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      val frames = payload.length.toLong / 64L // fake "frame sample" count
      val window = payload.take(256)
      val mean = window.map(b => (b & 0xff).toDouble).sum / window.length
      (header, frames, mean, true)
    }
  }

  /** Batch feature extraction: one pass per partition, codec initialized
    * once per partition (the expensive part for a real codec), rows
    * streamed — never materialized per-partition in memory.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val (header, frames, mean, ok) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, Option(r.payload).map(_.length.toLong).getOrElse(0L),
          header, frames, mean, ok)
      }
    }
  }

  /** Full pipeline as a DataFrame op (used by the rows-only query entry). */
  def features(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(asMedia(documents)).toDF()
}
