package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by distributed peeling: repeatedly remove nodes
  * with fewer than k neighbors still alive until a fixpoint — the
  * density filter community/recommendation pipelines run to strip the
  * sparse periphery before the expensive graph ops. Completes the graph
  * suite: MassFlow (ranking), connectedComponents (membership),
  * Triangles (local clustering), this (global density).
  *
  * Each round is one equi-join pass over the directed edge view
  * restricted to alive endpoints + a degree hash-agg with HAVING — the
  * Pregel-round shape: O(E_alive) shuffled per round, O(V_alive) state,
  * per-round lineage truncation so iteration count never grows the
  * plan. The fixpoint test is a count comparison — peeling is monotone
  * (alive only shrinks), so equal counts imply an identical set without
  * a set-difference pass. Rounds to converge is the graph's degeneracy
  * ordering depth, typically small; `maxRounds` is the loud runaway
  * guard, not a tuning knob.
  */
object KCore {

  /** Nodes of the k-core with their within-core degree.
    *
    * @param edges undirected (u, v); duplicates/reversals/self-loops
    *              canonicalized away.
    * @return (node, core_degree), every core_degree ≥ k.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val und = edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val dedges = und.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint() // read every round; never re-derive
    var alive = dedges.select(col("src").as("node")).distinct().localCheckpoint()
    var n = alive.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val next = dedges
        .join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src").as("node"))
        .localCheckpoint()
      val n2 = next.count()
      converged = n2 == n || n2 == 0L
      alive = next
      n = n2
      rounds += 1
    }
    require(converged, s"k-core did not converge in $maxRounds rounds")
    dedges
      .join(alive.select(col("node").as("src")), Seq("src"))
      .join(alive.select(col("node").as("dst")), Seq("dst"))
      .groupBy("src").agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("node"), col("core_degree"))
  }
}
