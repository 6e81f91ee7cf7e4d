package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-round (hop-bounded) single/multi-source shortest paths with exact
  * integer edge weights — Bellman-Ford on the min-plus semiring, the
  * weighted sibling of [[Bfs]]. Exact BIGINT distances make the result
  * engine-reproducible (float accumulation could not hash-match across
  * engines), and the round bound makes the state the k-hop-reachable
  * set, O(V).
  *
  * The engine iterates DELTA-ONLY (the distributed Bellman-Ford
  * optimization): each round relaxes edges only out of nodes whose
  * distance IMPROVED last round, merged into the running distance map by
  * a full-outer min. The oracle re-relaxes the ENTIRE reached set every
  * round (naive fixpoint), so the driver's hash match proves delta
  * pruning is pure execution strategy. Rounds past convergence are
  * no-ops on both sides.
  *
  * Scale shape: edges pre-partitioned on src and lineage-truncated once;
  * per-round state truncated via [[Checkpoints.truncate]];
  * `checkpointDir` opts into reliable checkpoints (executor-loss
  * survival on real clusters).
  */
object Sssp {

  /** @param edges   (src: BIGINT, dst: BIGINT, w: BIGINT) directed,
    *                non-negative integer weights
    * @param sources (node: BIGINT) seed set, distance 0
    * @return (node, dist): minimum path weight over paths of ≤ `rounds`
    *         edges from any seed, for every node so reachable
    */
  def hopBounded(edges: DataFrame, sources: DataFrame, rounds: Int,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    def ck(df: DataFrame) = Checkpoints.truncate(df, checkpointDir)
    val e = ck(edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).repartition(col("src")))
    var dist = ck(sources.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0L)))
    var changed = dist
    for (_ <- 1 to rounds) {
      val cand = e.join(changed, e("src") === changed("node"))
        .select(e("dst").as("node"), (changed("dist") + e("w")).as("nd"))
        .groupBy("node").agg(min(col("nd")).as("nd"))
      val merged = ck(dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("nd")), coalesce(col("nd"), col("dist"))).as("dist"),
          (col("dist").isNull || (col("nd").isNotNull && col("nd") < col("dist"))).as("improved")))
      changed = merged.filter(col("improved")).select("node", "dist")
      dist = merged.select("node", "dist")
    }
    dist
  }
}
