package graft.sources

import graft.ingest.Normalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** S1 analog: the reference ingests per-minute binary snapshot files
  * (pandas pickles, `etl/etl.py:161-170`). Pickle is Python-specific, so
  * the engine defines its own minimal binary snapshot codec and reads a
  * directory of such files with `spark.read.format("binaryFile")` + a
  * per-partition decode — the documented Spark path for opaque binary
  * sources (SURVEY.md §2.1 S1). Event time comes from the file NAME,
  * exactly like the reference (`etl/etl.py:139-159`).
  *
  * Format (little-endian): i32 row count, then per row
  * [i64 key, f64 value, f64 volume].
  */
object BinarySnapshots {

  def encode(rows: Seq[(Long, Double, Double)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + rows.size * 24).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(rows.size)
    rows.foreach { case (k, v, vol) => buf.putLong(k); buf.putDouble(v); buf.putDouble(vol) }
    buf.array()
  }

  def decode(bytes: Array[Byte]): Seq[(Long, Double, Double)] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt()
    (0 until n).map(_ => (buf.getLong(), buf.getDouble(), buf.getDouble()))
  }

  /** Read a directory of snapshot files into (key, value, volume, ts) —
    * ts parsed from each file's name. Decode runs per file inside the
    * executors (binaryFile rows stream through flatMap); the driver never
    * touches payload bytes.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
    val decoded = files
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decode(bytes).map { case (k, v, vol) => (path, k, v, vol) }
      }
      .toDF("path", "key", "value", "volume")
    decoded
      .withColumn("ts", Normalize.fileTimestamp(col("path")))
      .drop("path")
  }
}
