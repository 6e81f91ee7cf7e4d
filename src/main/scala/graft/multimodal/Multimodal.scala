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

  /** Audio frame-sampling: decode each WAV payload, interpret the data
    * region as 16-bit LE PCM, keep every `decimate`-th sample (the
    * frame-sample step of a media pipeline — stats over a stride, never
    * the full stream), and reduce to count / mean-|sample| / peak.
    * Sums are exact integers, so the one division is bit-identical in
    * any engine. Non-WAV and undecodable payloads yield no row.
    */
  def audioFrameStats(spark: SparkSession, documents: DataFrame,
                      decimate: Int = 4): DataFrame = {
    require(decimate > 0, s"decimate must be positive, got $decimate")
    import spark.implicits._
    asMedia(documents).mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = Option(r.payload).getOrElse(Array.emptyByteArray)
        val d = MediaCodec.decode(payload)
        if (!d.ok || !d.format.contains("wav")) None
        else {
          val from = d.contentOffset
          val nSamples = (payload.length - from) / 2
          var i = 0
          var n = 0L
          var sumAbs = 0L
          var peak = 0L
          while (i < nSamples) {
            val lo = payload(from + 2 * i) & 0xff
            val hi = payload(from + 2 * i + 1)
            val v = math.abs((hi << 8 | lo).toShort.toLong)
            n += 1; sumAbs += v; if (v > peak) peak = v
            i += decimate
          }
          Some((r.doc_id, nSamples.toLong, n,
            if (n == 0) None else Some(sumAbs.toDouble / n),
            if (n == 0) None else Some(peak)))
        }
      }
    }.toDF("doc_id", "n_samples", "n_sampled", "mean_abs_sample", "peak_sample")
  }

  /** Image resize planning: thumbnail dimensions fitting `maxDim`² while
    * preserving aspect ratio, computed from the PARSED width/height (pure
    * integer arithmetic — floor, never upscale, floor ≥ 1). The pixel
    * resample itself needs a raster codec and hangs off the same
    * partition-batched loop; the planning step is what drives storage
    * budgeting and is fully checkable.
    */
  def imageResizePlan(spark: SparkSession, documents: DataFrame,
                      maxDim: Int = 128): DataFrame = {
    features(spark, documents)
      .filter(col("decoded_ok") && col("format").isin("png", "jpeg", "avi"))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        // `div` (integer division), not `/` (double): the oracle uses
        // DuckDB's `//` and the two must round identically
        expr(s"CASE WHEN greatest(width, height) <= $maxDim THEN width " +
          s"ELSE greatest(1L, width * $maxDim div greatest(width, height)) END").as("thumb_w"),
        expr(s"CASE WHEN greatest(width, height) <= $maxDim THEN height " +
          s"ELSE greatest(1L, height * $maxDim div greatest(width, height)) END").as("thumb_h"))
  }
}
