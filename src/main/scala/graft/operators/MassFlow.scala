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
  * shuffles on graph keys, the standard Pregel round. Per-round lineage
  * is truncated so the plan does not grow with iteration count;
  * `checkpointDir` picks the truncation's fault model — see
  * [[Checkpoints.truncate]] (executor-local by default, reliable
  * filesystem checkpoints for clusters that must survive executor loss
  * mid-loop).
  */
object MassFlow {

  /** @param edges (src: BIGINT, dst: BIGINT) directed edges; duplicates
    *              are meaningful (parallel edges carry mass twice)
    * @param checkpointDir fault-tolerant dir for reliable per-round
    *                      checkpoints; None = executor-local
    * @return (node, mass) for every node appearing as src or dst
    */
  def propagate(edges: DataFrame, iters: Int, initMass: Long = 1000000L,
                checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    def ck(df: DataFrame) = Checkpoints.truncate(df, checkpointDir)
    // materialize the edge set once: every round joins it, and without
    // truncation each round would re-run the caller's upstream lineage
    // (scan + distinct + union) from scratch — measured 8.4 s → 4.8 s on
    // the sf0.1 catalog graph. PRE-PARTITIONED on the join key before the
    // checkpoint: the checkpointed relation keeps its outputPartitioning,
    // so every round's `edges ⋈ share ON src = node` reuses the edge
    // side's layout instead of re-exchanging the (large) edge set per
    // round — on a cluster that is iters× fewer full-edge shuffles
    val e = ck(edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")))
    val deg = ck(e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    var m = ck(nodes.withColumn("mass", lit(initMass)))
    for (_ <- 1 to iters) {
      val md = m.join(deg, Seq("node"), "left")
      // dead ends (d null) keep everything; others keep mass mod d
      val keep = md.select(col("node"),
        when(col("d").isNull, col("mass"))
          .otherwise(col("mass") % col("d")).as("c"))
      val share = md.filter(col("d").isNotNull)
        .select(col("node"), expr("mass div d").as("share"))
      val sends = e.join(share, e("src") === share("node"))
        .select(col("dst").as("node"), col("share").as("c"))
      // r17 (guide §2.4): keeps and incoming shares fold in ONE
      // aggregation instead of aggregating the sends and LEFT-JOINING
      // them back onto the keeps — one join/exchange fewer per round;
      // identical masses (every send target has a keep row, addition is
      // associative, and the exact-BIGINT sum is order-independent)
      m = ck(keep.unionByName(sends)
        .groupBy(col("node")).agg(sum(col("c")).as("mass")))
    }
    m
  }
}
