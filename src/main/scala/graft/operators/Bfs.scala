package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance over a directed graph — the reachability
  * primitive under "how far is every node from the seed set" questions
  * (affiliate distance, contamination blast radius, link-graph crawl
  * depth). Exact integer hops, so the result is engine-reproducible and
  * the DuckDB oracle can hash-match it.
  *
  * The engine iterates FRONTIER-ONLY: each round expands just the nodes
  * discovered last round, anti-joins against the visited set, and tags
  * new nodes with the round number — each node's first discovery is its
  * minimum hop distance, so per-round work is O(frontier ⋈ edges) and
  * the visited state is O(V). The oracle states the NAIVE fixpoint
  * (re-expand the ENTIRE reached set every round, min-aggregate the
  * hops); the driver's hash match proves frontier pruning — the thing
  * that makes BFS feasible at 100 TB — is pure execution strategy.
  *
  * Scale shape: edges are pre-partitioned on src and lineage-truncated
  * once (every round reuses the layout — see MassFlow's note); per-round
  * state is truncated via [[Checkpoints.truncate]] so the plan does not
  * grow with depth; `checkpointDir` opts into reliable checkpoints for
  * clusters that must survive executor loss mid-traversal.
  */
object Bfs {

  /** @param edges   (src: BIGINT, dst: BIGINT) directed edges
    * @param sources (node: BIGINT) seed set, hop 0
    * @return (node, hops) for every node within `maxHops` of a seed,
    *         hops = minimum hop distance (BIGINT)
    */
  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int,
           checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    def ck(df: DataFrame) = Checkpoints.truncate(df, checkpointDir)
    val e = ck(edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")))
    var visited = ck(sources.select(col("node").cast("long"))
      .distinct().withColumn("hops", lit(0L)))
    var frontier = visited.select("node")
    for (i <- 1 to maxHops) {
      val next = ck(e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti"))
      visited = ck(visited.unionByName(
        next.withColumn("hops", lit(i.toLong))))
      frontier = next.select("node")
    }
    visited
  }
}
