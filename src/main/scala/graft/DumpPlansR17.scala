package graft

import org.apache.spark.sql.SparkSession

/** r17 optimization-round plan dumps: writes `.explain("formatted")` for
  * the given queries to plans/r17/<name>_<tag>.txt under a session that
  * MIRRORS the bench config (local[32], shuffle.partitions=32, AQE on,
  * GraftExtensions) — unlike `Explain`, whose local[4] no-extensions
  * session plans the naive (pre-rewrite) joins and different AQE shapes.
  * Usage: runMain graft.DumpPlansR17 <sfDir> <tag> <name1,name2,...>
  */
object DumpPlansR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans/r17")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plans] wrote plans/r17/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
