package graft

import graft.operators.SketchStore
import org.apache.spark.sql.functions._

class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("graft-hll").toString

  test("range estimate from per-day sketches tracks the exact distinct count") {
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val path = freshPath()
    SketchStore.writeDailyDistinctSketch(ev, "ts", "user_id", path)

    val est = SketchStore.estimateDistinct(spark, path, "user_id",
      "2024-01-01", "2024-12-31")
    val exact = ev.select($"user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact — beyond HLL lgK=12 error")

    // a subrange reads only its days' sketches and stays near its own truth
    val subEst = SketchStore.estimateDistinct(spark, path, "user_id",
      "2024-01-01", "2024-01-10")
    val subExact = ev.filter(to_date($"ts") <= "2024-01-10")
      .select($"user_id").distinct().count()
    assert(math.abs(subEst - subExact).toDouble / subExact < 0.05,
      s"subrange estimate $subEst vs exact $subExact")
  }

  test("incrementally appended days merge to the same estimate as a one-shot build") {
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val oneShot = freshPath()
    SketchStore.writeDailyDistinctSketch(ev, "ts", "user_id", oneShot)
    val incremental = freshPath()
    SketchStore.writeDailyDistinctSketch(
      ev.filter(to_date($"ts") < "2024-01-16"), "ts", "user_id", incremental)
    SketchStore.writeDailyDistinctSketch(
      ev.filter(to_date($"ts") >= "2024-01-16"), "ts", "user_id", incremental,
      mode = "append")
    val a = SketchStore.estimateDistinct(spark, oneShot, "user_id",
      "2024-01-01", "2024-12-31")
    val b = SketchStore.estimateDistinct(spark, incremental, "user_id",
      "2024-01-01", "2024-12-31")
    // same per-day inputs → identical sketches → identical union estimate
    assert(a == b, s"one-shot $a != incremental $b")
  }

  test("a store built over a different key or precision refuses to estimate") {
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val path = freshPath()
    SketchStore.writeDailyDistinctSketch(ev, "ts", "user_id", path)
    intercept[IllegalArgumentException] {
      SketchStore.estimateDistinct(spark, path, "event_id", "2024-01-01", "2024-12-31")
    }
    intercept[IllegalArgumentException] {
      SketchStore.estimateDistinct(spark, path, "user_id", "2024-01-01", "2024-12-31", lgK = 14)
    }
  }

  test("an empty range estimates zero, not a crash") {
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val path = freshPath()
    SketchStore.writeDailyDistinctSketch(ev, "ts", "user_id", path)
    assert(SketchStore.estimateDistinct(spark, path, "user_id",
      "2030-01-01", "2030-12-31") == 0L)
  }
}
