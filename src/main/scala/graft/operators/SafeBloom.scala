package graft.operators

import org.apache.spark.sql.DataFrame

/** `df.stat.bloomFilter`, safe on an EMPTY build side.
  *
  * Spark's distributed bloom build never initializes the sketch buffer
  * when zero rows arrive at the aggregate, and serializing that sketch
  * NPEs on the null bit array (degenerate-gauntlet finding: an empty
  * benchmark set / an empty edge list crashed every bloom-prefiltered
  * path). An explicitly-created empty sketch is substituted: its
  * mightContain is false for everything, which is exactly what an empty
  * build side means — the prefilter rejects all, and the downstream
  * confirm join is empty anyway.
  */
object SafeBloom {

  /** Serialized sketch over `hashed(colName)` (64-bit hash values).
    * Counts the build side itself for sizing; callers that already know
    * the count can pass it to skip the extra pass.
    */
  def serialized(hashed: DataFrame, colName: String, fpp: Double,
                 knownCount: Long = -1L): Array[Byte] = {
    val n = if (knownCount >= 0) knownCount else hashed.count()
    val bloom =
      if (n == 0) org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
      else hashed.stat.bloomFilter(colName, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}
