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
    * @param checkpointDir opts into reliable checkpoints for the
    *              per-round lineage truncation (see [[Checkpoints]]) —
    *              on a preemptible cluster an executor lost mid-peel
    *              otherwise kills the job.
    * @return (node, core_degree), every core_degree ≥ k.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50,
            checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    def ck(df: DataFrame) = Checkpoints.truncate(df, checkpointDir)
    val und = edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val dedges = ck(und.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst")))) // read every round; never re-derive
    var alive = ck(dedges.select(col("src").as("node")).distinct())
    var n = alive.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      val next = ck(dedges
        .join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src").as("node")))
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

  /** [[kCore]] by DELTA peeling: instead of re-joining the full edge set
    * against the alive set every round (O(E) shuffled per round — the
    * single-box memory pressure the sf10 audit measured at 18.8× for 10×
    * data), maintain an O(V) degree table and per round propagate only
    * the REMOVED nodes: their edges decrement surviving neighbors'
    * degrees, and a node leaves when its degree crosses below k. Every
    * edge contributes at most two decrements across the WHOLE run, so
    * total join work is O(E) overall instead of O(E · rounds), and the
    * per-round lineage truncation checkpoints O(V_alive) degree rows
    * instead of an O(E)-derived node set.
    *
    * The edge list is hash-partitioned by `src` ONCE up front
    * (`repartition` + `localCheckpoint`, which preserves the physical
    * partitioning): each round's probe join re-uses that layout and only
    * the small removed side shuffles. Identical output to [[kCore]]
    * (KCoreSpec proves it on the fixture graphs). `maxRounds` is the
    * same runaway guard, but the counters differ by one near the limit:
    * delta counts only removal waves, while [[kCore]] spends one extra
    * confirming round on the fixpoint (n2 == n) — so delta needs peel
    * waves ≤ maxRounds where kCore needs waves + 1. Copy maxRounds
    * values between the two intentionally. `checkpointDir` opts into
    * reliable per-round checkpoints exactly as in [[kCore]].
    */
  def kCoreDelta(edges: DataFrame, k: Int, maxRounds: Int = 50,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    def ck(df: DataFrame) = Checkpoints.truncate(df, checkpointDir)
    val und = edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // reliable checkpoint() preserves outputPartitioning too (LogicalRDD
    // carries it), so the once-partitioned layout survives either mode
    val dedges = ck(und.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src")))
    // full degrees: partial agg over the already-src-partitioned edges
    var deg = ck(dedges.groupBy("src").agg(count(lit(1)).as("d"))
      .select(col("src").as("node"), col("d")))
    var removed = deg.filter(col("d") < k).select("node")
    var aliveDeg = deg.filter(col("d") >= k)
    var nRemoved = removed.count()
    var rounds = 0
    while (nRemoved > 0 && rounds < maxRounds) {
      val decr = dedges
        .join(removed.select(col("node").as("src")), Seq("src"))
        .groupBy("dst").agg(count(lit(1)).as("dec"))
      // left join: an alive node untouched by this round's removals
      // keeps its degree; a removed dst is absent from aliveDeg (no-op)
      deg = ck(aliveDeg
        .join(decr.select(col("dst").as("node"), col("dec")), Seq("node"), "left")
        .select(col("node"), (col("d") - coalesce(col("dec"), lit(0L))).as("d")))
      removed = deg.filter(col("d") < k).select("node")
      aliveDeg = deg.filter(col("d") >= k)
      nRemoved = removed.count()
      rounds += 1
    }
    require(nRemoved == 0, s"k-core did not converge in $maxRounds rounds")
    aliveDeg.select(col("node"), col("d").as("core_degree"))
  }
}
