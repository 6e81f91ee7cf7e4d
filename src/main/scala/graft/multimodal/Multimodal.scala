package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. At 100 TB the
  * payload column lives in Parquet as `binary` (or as object-store URIs
  * resolved at read time); metadata stays queryable columns.
  */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Header-level features. Option fields are None when the format doesn't
  * carry them (images have no sample_rate) or the payload didn't decode.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    header_hex: String,
    format: Option[String],
    width: Option[Long],
    height: Option[Long],
    sample_rate: Option[Long],
    channels: Option[Long],
    bit_depth: Option[Long],
    n_frames: Option[Long],
    mean_byte: Option[Double],
    decoded_ok: Boolean)

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * processed batch-wise with `mapPartitions` (the Scala analog of a
  * Pandas-UDF batch loop: one iterator per partition, codec state
  * initialized once per partition, rows streamed through).
  *
  * The decode step is [[MediaCodec]] — a REAL header-level parser for
  * public container formats (PNG signature+IHDR with CRC32 verification,
  * RIFF/WAVE chunk walk, JPEG marker scan), pure JVM, no codec libraries.
  * Payloads are synthesized by the same codec with deterministic planted
  * dimensions, so a DuckDB oracle recomputing those fields from doc_id
  * arithmetic checks the build→parse round trip byte-for-byte.
  */
object Multimodal {

  /** Wrap documents as media rows: a real format header (planted per
    * doc_id by [[MediaCodec.build]]) followed by the document's UTF-8
    * bytes as the opaque content region. Stands in for reading a `binary`
    * Parquet column of real image/audio bytes.
    */
  def asMedia(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (docId, text) =>
        MediaRow(docId, MediaCodec.mediaType(docId), MediaCodec.build(docId, text))
      }
  }

  /** Batch feature extraction: one pass per partition, codec initialized
    * once per partition (the expensive part for a real codec), rows
    * streamed — never materialized per-partition in memory. `mean_byte`
    * is over the first 256 bytes of the decoded content region — a cheap
    * stand-in for the per-item content statistic a real pipeline computes
    * post-decode.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition native-codec init would go here
      rows.map { r =>
        val payload = Option(r.payload).getOrElse(Array.emptyByteArray)
        val d = MediaCodec.decode(payload)
        val headerHex = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
        val meanByte =
          if (!d.ok) None
          else {
            val win = payload.slice(d.contentOffset, d.contentOffset + 256)
            if (win.isEmpty) Some(0.0)
            else Some(win.map(b => (b & 0xff).toDouble).sum / win.length)
          }
        MediaFeatures(r.doc_id, r.media_type, payload.length.toLong, headerHex,
          d.format, d.width, d.height, d.sampleRate, d.channels, d.bitDepth,
          d.nFrames, meanByte, d.ok)
      }
    }
  }

  /** Full pipeline as a DataFrame op (used by the query entries). */
  def features(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(asMedia(documents)).toDF()
}
