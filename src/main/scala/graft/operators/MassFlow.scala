package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative random-walk mass propagation over a directed graph — the
  * PageRank/eigenvector-centrality family, restated in EXACT integer
  * arithmetic so the result is engine-reproducible (a float PageRank can
  * never hash-match across engines: per-node sums arrive in different
  * orders). Each node starts with `initMass` units; per round every node
  * with out-degree d sends `mass div d` units down each out-edge and keeps
  * the remainder `mass mod d` (dead ends keep everything). Total mass is
  * conserved exactly every round, and because every per-node update is a
  * sum of BIGINTs, the result is independent of partitioning and
  * aggregation order — the property the DuckDB oracle relies on.
  *
  * Scale shape: the per-round state is one (node, mass) row per node —
  * O(V), tiny next to the edge set. Each round is two equi-joins (state ⋈
  * out-degree on node, edges ⋈ state on src) and one sum-by-dst — all
  * shuffles on graph keys, the standard Pregel round. `localCheckpoint`
  * truncates the O(V) state's lineage each round so the plan does not
  * grow with iteration count; on a multi-node cluster with executor loss
  * mid-loop, swap for reliable `checkpoint()` under a job dir (same note
  * as `Dedup.connectedComponents`).
  */
object MassFlow {

  /** @param edges (src: BIGINT, dst: BIGINT) directed edges; duplicates
    *              are meaningful (parallel edges carry mass twice)
    * @return (node, mass) for every node appearing as src or dst
    */
  def propagate(edges: DataFrame, iters: Int, initMass: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // materialize the edge set once: every round joins it, and without
    // truncation each round would re-run the caller's upstream lineage
    // (scan + distinct + union) from scratch — measured 8.4 s → 4.8 s on
    // the sf0.1 catalog graph
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    var m = nodes.withColumn("mass", lit(initMass)).localCheckpoint()
    for (_ <- 1 to iters) {
      val md = m.join(deg, Seq("node"), "left")
      // dead ends (d null) keep everything; others keep mass mod d
      val keep = md.select(col("node"),
        when(col("d").isNull, col("mass"))
          .otherwise(col("mass") % col("d")).as("keep"))
      val share = md.filter(col("d").isNotNull)
        .select(col("node"), expr("mass div d").as("share"))
      val inc = e.join(share, e("src") === share("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("got"))
      m = keep.join(inc, Seq("node"), "left")
        .select(col("node"),
          (col("keep") + coalesce(col("got"), lit(0L))).as("mass"))
        .localCheckpoint()
    }
    m
  }
}
