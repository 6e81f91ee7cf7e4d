package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline as ONE DataFrame DAG —
  * the LLM-pipeline analog of `etl_pipeline` (which replays the
  * reference's whole ETL): quality gate → benchmark-shard removal →
  * dedup (exact keep-min or near-dup keep-best) → decontamination →
  * deterministic content-hash split.
  *
  * One pass over the corpus plus the n-gram join for contamination;
  * every stage is an operator this engine already oracles individually,
  * so the composite's oracle is the same CTE chain. Scale shape: the
  * only shuffles are the dedup partition, the contamination shingle
  * join, and the final split projection — no stage widens the data.
  *
  * The two composites differ ONLY in their dedup stage; the quality
  * gate, contamination anti-join, split hash, and final projection are
  * shared helpers so the pipelines cannot silently diverge.
  */
object Curate {

  /** language-ID + quality scoring, then the quality/eval-shard gate —
    * stage 1 of every curation flavor. */
  private def qualityGate(documents: DataFrame, isBench: Column,
                          qualityMin: Double): DataFrame =
    TextAnalysis.withLangId(TextAnalysis.withQuality(documents))
      .filter(col("quality_score") >= qualityMin && !isBench)

  /** deterministic content-hash split bucket (0–99) and its 80/10/10
    * assignment — retry-safe and engine-reproducible. */
  private val bucket = expr(TextAnalysis.hashBucketExpr("doc_id", 100))
  private val splitCol =
    when(bucket < 80, "train").when(bucket < 90, "validation")
      .otherwise("test").as("split")

  /** contamination anti-join + final projection — the closing stages of
    * every curation flavor. `front` = the flavor's output columns
    * (`split` is appended). */
  private def decontaminateAndSplit(kept: DataFrame, documents: DataFrame,
                                    isBench: Column, n: Int,
                                    front: Seq[Column]): DataFrame = {
    val contaminated = Decontaminate.contaminated(documents, isBench, n)
      .select(col("doc_id"))
    kept.join(contaminated, Seq("doc_id"), "left_anti")
      .select(front :+ splitCol: _*)
  }

  /** `isBench` marks the held-out eval shard: those docs are excluded
    * from the output AND any training doc sharing an `n`-gram with them
    * is dropped. Dedup stage: EXACT (md5 of canonicalized text, keep-min
    * doc id). Returns (doc_id, predicted_lang, n_tokens, quality_score,
    * split).
    */
  def curate(documents: DataFrame, isBench: Column,
             qualityMin: Double = 0.535, n: Int = 8): DataFrame = {
    val deduped = qualityGate(documents, isBench, qualityMin)
      .withColumn("_th", md5(lower(trim(col("text")))))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_th")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
    decontaminateAndSplit(deduped, documents, isBench, n,
      Seq(col("doc_id"), col("predicted_lang"), col("n_tokens"), col("quality_score")))
  }

  /** Near-dup-aware curation over PRECOMPUTED cluster labels. Dedup
    * stage: keep-BEST-per-near-dup-cluster (argmax quality among the
    * surviving members, tie → lowest doc_id).
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
    val wBest = Window.partitionBy(col("canonical_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    val best = qualityGate(documents, isBench, qualityMin)
      .join(labels, Seq("doc_id"))
      .withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1)
    decontaminateAndSplit(best, documents, isBench, n,
      Seq(col("doc_id"), col("canonical_id"), col("predicted_lang"),
        col("n_tokens"), col("quality_score")))
  }
}
