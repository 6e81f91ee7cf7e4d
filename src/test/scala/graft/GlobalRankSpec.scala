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
}
