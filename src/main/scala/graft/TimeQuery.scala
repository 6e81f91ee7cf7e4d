package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one query N times in a warm session to separate plan/
  * codegen overhead from steady-state cost.
  * Usage: runMain graft.TimeQuery <sfDir> <name> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // >= sf1 needs partitions sized to memory (128 at sf10 — see SCALE.md)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
