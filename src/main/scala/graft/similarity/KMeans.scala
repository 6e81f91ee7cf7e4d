package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline k-means codebook training (Lloyd iterations) — the producer
  * of the external centroid tables `Similarity.ivfTopKWithCentroids`
  * and `pqAdc*` consume. Training loops are not engine-reproducible, so
  * this never appears inside an oracled query (the catalog's IVF entries
  * read FIXED codebooks); it is the operator a production deployment
  * runs offline to make those codebooks.
  *
  * Scale shape per iteration: assignment is one crossJoin against the
  * BROADCAST k-row codebook scored with the codegen'd `graft_dot`
  * (O(n·k) work, no shuffle), then one (cell, dim) aggregation for the
  * new means (map-side partial sums; k×64 rows out). The k×64 centroid
  * table round-trips through `localCheckpoint`, never the driver, and
  * per-round lineage is truncated like `Dedup.connectedComponents`.
  * Initialization is deterministic (k lowest-id vectors), so the whole
  * training run is reproducible given the data.
  */
object KMeans {

  /** Deterministic farthest-first seeding (k-center init): seed 1 is the
    * lowest-id vector; each next seed is the vector minimizing its max
    * cosine to the chosen seeds (ties on id). The naive "k lowest ids"
    * seeds all land in one region of a clustered corpus and Lloyd never
    * fully recovers (measured purity 0.75 vs 1.0 on planted clusters);
    * farthest-first spreads seeds across the clusters in k cheap
    * broadcast-scored passes. The k-means‖ oversampling init is the
    * web-scale upgrade — same consumer contract.
    */
  private def farthestFirstSeeds(embeddings: DataFrame, k: Int): DataFrame = {
    val e = Similarity.quantized(embeddings).select(col("vec_id"), col("q"), col("norm2"))
    var seedIds = Seq(embeddings.agg(min(col("vec_id"))).head.getLong(0))
    while (seedIds.size < k) {
      val qc = Similarity.quantized(
          embeddings.filter(col("vec_id").isin(seedIds: _*)))
        .select(col("q").as("qc"), col("norm2").as("nc"))
      val next = e.filter(!col("vec_id").isin(seedIds: _*))
        .crossJoin(broadcast(qc))
        .withColumn("cos",
          expr("graft_dot(q, qc)").cast("double") /
            sqrt(col("norm2").cast("double") * col("nc").cast("double")))
        .groupBy(col("vec_id")).agg(max(col("cos")).as("maxcos"))
        .orderBy(col("maxcos"), col("vec_id"))
        .limit(1).head.getLong(0)
      seedIds = seedIds :+ next
    }
    embeddings.filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding"))
  }

  /** `iters` Lloyd rounds with cosine assignment (the similarity the IVF
    * consumer probes with). Returns (assignments, centroids):
    * assignments = (vec_id, cell); centroids = (cent_id, embedding:
    * array<float>) — directly pluggable into `ivfTopKWithCentroids`.
    * Cells that lose every member keep their previous centroid.
    */
  def train(embeddings: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val e = Similarity.quantized(embeddings).select(col("vec_id"), col("q"), col("norm2"))
      .localCheckpoint()
    var cents = farthestFirstSeeds(embeddings, k).localCheckpoint()
    var assign: DataFrame = null
    (1 to iters).foreach { _ =>
      val qc = Similarity.quantized(cents)
        .select(col("cent_id"), col("q").as("qc"), col("norm2").as("nc"))
      val scored = e.crossJoin(broadcast(qc))
        .withColumn("cos",
          expr("graft_dot(q, qc)").cast("double") /
            sqrt(col("norm2").cast("double") * col("nc").cast("double")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cent_id"))
      assign = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"))
        .localCheckpoint()
      val means = assign
        .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("v")).as("mu"))
        .groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, mu))), s -> cast(s.mu as float))")
          .as("new_emb"))
      // empty cells keep their previous centroid
      cents = cents.join(means, cents("cent_id") === means("cell"), "left")
        .select(col("cent_id"), coalesce(col("new_emb"), col("embedding")).as("embedding"))
        .localCheckpoint()
    }
    (assign, cents)
  }
}
