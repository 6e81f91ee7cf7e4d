package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bisect for the fuzzy_semi_rule cost (r17): times isolated pieces
  * of the rewritten plan to find the ~2 s/aggregate anomaly.
  * Usage: runMain graft.FuzzyBisect <sfDir>
  */
object FuzzyBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.textops.TextAnalysis.{hashBucketExpr, hashRawExpr}
    def canon = Tables.supplier(spark, sfDir).selectExpr(
      "s_suppkey AS c_key",
      s"""concat('w', cast(${hashBucketExpr("(s_suppkey * 3)", 500L)} as string),
                 '-w', cast(${hashBucketExpr("(s_suppkey * 3 + 1)", 500L)} as string),
                 '-w', cast(${hashBucketExpr("(s_suppkey * 3 + 2)", 500L)} as string)) AS c_name""")
    def dirty = canon
      .withColumn("p",
        expr(hashRawExpr("(c_key * 7)")) % (length(col("c_name")) - 1) + 1)
      .selectExpr("c_key AS d_key",
        "concat(substring(c_name, 1, cast(p - 1 as int)), substring(c_name, cast(p + 1 as int), 100)) AS d_name")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[bisect] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("dirty-materialize") { noop(dirty) }
    time("dirty-groupBy-count") { noop(dirty.groupBy("d_key", "d_name").count()) }
    time("dirty-distinct") { noop(dirty.distinct()) }
    time("canon-groupBy-count") { noop(canon.groupBy("c_key", "c_name").count()) }
    // same aggregate over a MATERIALIZED (checkpointed) dirty — expression
    // lineage cut, so the md5 chain cannot be re-evaluated anywhere
    val mat = dirty.localCheckpoint()
    time("materialized-groupBy-count") { noop(mat.groupBy("d_key", "d_name").count()) }
    // full semi query for reference
    time("fuzzy_semi_rule-full") {
      noop(SparkEntry.queries("fuzzy_semi_rule")(spark, sfDir))
    }
    spark.stop()
  }
}
