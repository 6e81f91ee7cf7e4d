package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing coverage. The decode step is a documented stub
  * (no codecs in this container) but the binary-column schema, the
  * partition-batched extraction, and the aggregation over extracted
  * features are real. No oracle — mapPartitions-typed pipelines are not
  * SQL-expressible; the driver records a rows-only check, and
  * MultimodalSpec asserts the feature semantics.
  */
object MultimodalQueries {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "multimodal_features",
      None,
      (spark, dir) => {
        Multimodal.features(spark, Tables.documents(spark, dir))
          .orderBy("doc_id")
      }),
    QueryDef(
      "multimodal_rollup",
      None,
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
