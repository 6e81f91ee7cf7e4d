package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The r11-verdict k-core memory experiment, decided by measurement:
  * `graph_kcore`'s 18.8× sf10 ratio was single-box-memory bound (each
  * peel round re-shuffles the full 59M-edge co-purchase list). Candidate
  * fix = delta peeling ([[graft.operators.KCore.kCoreDelta]]): O(V)
  * degree state, only removed nodes propagate. Accept criterion, stated
  * up front (VERDICT r11 #4): delta ≤ 14.9 s at sf1 AND no OOM at sf10
  * under the same 28g/16-thread budget the r11 audit used — else keep
  * the current shape and close the item (the edge-peeling negative
  * result at SCALE.md:1272 is the template).
  *
  * Usage: SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE_PARTITIONS=64|128 \
  *        SPARK_DRIVER_MEM=28g tools/run_main.sh graft.KCoreExperiment \
  *        <sfDir> [impl=both|cur|delta]
  * Prints one JSON line per impl: {"impl":…,"secs":…,"rows":…}.
  */
object KCoreExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-kcore-experiment")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the exact graph_kcore construction (GraphQueries.scala)
    def edges = {
      val pairs = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
        .distinct()
      pairs.alias("a").join(pairs.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
    }
    def run(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f().count()
      println(f"""{"impl":"$label","sf_dir":"$sfDir","secs":${(System.nanoTime() - t0) / 1e9}%.1f,"rows":$rows}""")
    }
    if (which == "both" || which == "delta")
      run("delta", () => graft.operators.KCore.kCoreDelta(edges, k = 65, maxRounds = 12))
    if (which == "both" || which == "cur")
      run("cur", () => graft.operators.KCore.kCore(edges, k = 65, maxRounds = 12))
    spark.stop()
  }
}
