package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline as ONE DataFrame DAG —
  * the LLM-pipeline analog of `etl_pipeline` (which replays the
  * reference's whole ETL): quality gate → benchmark-shard removal →
  * exact dedup (keep-min doc id) → decontamination → deterministic
  * content-hash split.
  *
  * One pass over the corpus plus the n-gram join for contamination;
  * every stage is an operator this engine already oracles individually,
  * so the composite's oracle is the same CTE chain. Scale shape: the
  * only shuffles are the dedup-hash partition, the contamination
  * shingle join, and the final split projection — no stage widens the
  * data.
  */
object Curate {

  /** `isBench` marks the held-out eval shard: those docs are excluded
    * from the output AND any training doc sharing an `n`-gram with them
    * is dropped. Returns (doc_id, predicted_lang, n_tokens,
    * quality_score, split).
    */
  def curate(documents: DataFrame, isBench: Column,
             qualityMin: Double = 0.535, n: Int = 8): DataFrame = {
    val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(documents))
    val kept = scored.filter(col("quality_score") >= qualityMin && !isBench)
    val deduped = kept
      .withColumn("_th", md5(lower(trim(col("text")))))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_th")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
    val contaminated = Decontaminate.contaminated(documents, isBench, n)
      .select(col("doc_id"))
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100")
    deduped
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"), col("predicted_lang"), col("n_tokens"), col("quality_score"),
        when(bucket < 80, "train").when(bucket < 90, "validation")
          .otherwise("test").as("split"))
  }

  /** Near-dup-aware curation over PRECOMPUTED cluster labels: quality
    * gate → eval-shard removal → keep-BEST-per-near-dup-cluster (argmax
    * quality among the surviving members, tie → lowest doc_id) →
    * decontamination → deterministic split.
    *
    * `labels` (doc_id, canonical_id) is an ARGUMENT, not recomputed: the
    * LSH pair graph + connected components is the expensive stage of the
    * whole pipeline, so the production shape materializes it once and
    * feeds every consumer (this curation, cluster-size stats, span
    * scrubbing) from the same DataFrame — see the `curate_neardup`
    * catalog entry, which localCheckpoints the labels before this call.
    */
  def curateNearDup(documents: DataFrame, labels: DataFrame, isBench: Column,
                    qualityMin: Double = 0.535, n: Int = 8): DataFrame = {
    val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(documents))
    val kept = scored.filter(col("quality_score") >= qualityMin && !isBench)
    val wBest = Window.partitionBy(col("canonical_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    val best = kept
      .join(labels, Seq("doc_id"))
      .withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1)
    val contaminated = Decontaminate.contaminated(documents, isBench, n)
      .select(col("doc_id"))
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100")
    best
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"), col("canonical_id"), col("predicted_lang"),
        col("n_tokens"), col("quality_score"),
        when(bucket < 80, "train").when(bucket < 90, "validation")
          .otherwise("test").as("split"))
  }
}
