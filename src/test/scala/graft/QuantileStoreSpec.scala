package graft

import graft.operators.QuantileStore
import org.apache.spark.sql.functions._

class QuantileStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("graft-histq").toString

  // domain calibration for events.value at this SF (checked in-test;
  // sf0.001 spans [0.03, 327.53])
  private val Lo = 0.0
  private val Hi = 400.0
  private val Bins = 1024

  test("range quantiles from per-day histograms stay inside the grid error bound") {
    val ev = Tables.events(spark, sf).select($"ts", $"value")
    val path = freshPath()
    QuantileStore.writeDailyHistogram(ev, "ts", "value", path, Lo, Hi, Bins)

    val qs = Seq(0.25, 0.5, 0.9, 0.95, 0.99)
    val est = QuantileStore.estimateQuantiles(spark, path, "value",
      "2024-01-01", "2024-12-31", qs, Lo, Hi, Bins)
      .as[(Double, Double)].collect().toMap
    val exact = ev.stat.approxQuantile("value", qs.toArray, 0.0) // rel=0 → exact
    val width = (Hi - Lo) / Bins
    for ((q, ex) <- qs.zip(exact)) {
      assert(math.abs(est(q) - ex) <= width + 1e-9,
        s"q=$q estimate ${est(q)} vs exact $ex beyond bin width $width")
    }
    // calibration sanity: the domain really covers the data (no clamping
    // distorted the test)
    val (mn, mx) = ev.agg(min($"value"), max($"value")).as[(Double, Double)].head()
    assert(mn >= Lo && mx < Hi, s"recalibrate the test domain: data spans [$mn, $mx]")
  }

  test("appended days merge to identical estimates as a one-shot build (exact bins add)") {
    val ev = Tables.events(spark, sf).select($"ts", $"value")
    val oneShot = freshPath()
    QuantileStore.writeDailyHistogram(ev, "ts", "value", oneShot, Lo, Hi, Bins)
    val inc = freshPath()
    QuantileStore.writeDailyHistogram(
      ev.filter(to_date($"ts") < "2024-01-16"), "ts", "value", inc, Lo, Hi, Bins)
    QuantileStore.writeDailyHistogram(
      ev.filter(to_date($"ts") >= "2024-01-16"), "ts", "value", inc, Lo, Hi, Bins,
      mode = "append")
    val qs = Seq(0.1, 0.5, 0.9)
    val a = QuantileStore.estimateQuantiles(spark, oneShot, "value",
      "2024-01-01", "2024-12-31", qs, Lo, Hi, Bins).as[(Double, Double)].collect().toSeq
    val b = QuantileStore.estimateQuantiles(spark, inc, "value",
      "2024-01-01", "2024-12-31", qs, Lo, Hi, Bins).as[(Double, Double)].collect().toSeq
    assert(a == b, s"one-shot $a != incremental $b") // bin counts add exactly
  }

  test("subrange reads only its days and matches that range's own distribution") {
    val ev = Tables.events(spark, sf).select($"ts", $"value")
    val path = freshPath()
    QuantileStore.writeDailyHistogram(ev, "ts", "value", path, Lo, Hi, Bins)
    val sub = ev.filter(to_date($"ts") <= "2024-01-10")
    val est = QuantileStore.estimateQuantiles(spark, path, "value",
      "2024-01-01", "2024-01-10", Seq(0.5), Lo, Hi, Bins)
      .as[(Double, Double)].head()._2
    val exact = sub.stat.approxQuantile("value", Array(0.5), 0.0).head
    assert(math.abs(est - exact) <= (Hi - Lo) / Bins + 1e-9)
  }

  test("compaction folds appended rows without changing any estimate") {
    val ev = Tables.events(spark, sf).select($"ts", $"value")
    val path = freshPath()
    // append the same batch twice → every occupied (day, bin) has two
    // store rows (a replayed/micro-batched ingest shape)
    QuantileStore.writeDailyHistogram(ev, "ts", "value", path, Lo, Hi, Bins)
    QuantileStore.writeDailyHistogram(ev, "ts", "value", path, Lo, Hi, Bins, mode = "append")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    def est() = QuantileStore.estimateQuantiles(spark, path, "value",
      "2024-01-01", "2024-12-31", qs, Lo, Hi, Bins).as[(Double, Double)].collect().toSeq
    val before = est()
    val rowsBefore = spark.read.parquet(path).count()
    QuantileStore.compact(spark, path)
    val rowsAfter = spark.read.parquet(path).count()
    assert(rowsAfter < rowsBefore, s"compaction did not fold: $rowsBefore -> $rowsAfter")
    assert(est() == before, "compaction changed an estimate")
  }

  test("a store built over a different column or grid refuses to merge") {
    val ev = Tables.events(spark, sf).select($"ts", $"value")
    val path = freshPath()
    QuantileStore.writeDailyHistogram(ev, "ts", "value", path, Lo, Hi, Bins)
    intercept[IllegalArgumentException] {
      QuantileStore.estimateQuantiles(spark, path, "value",
        "2024-01-01", "2024-12-31", Seq(0.5), Lo, Hi, bins = 512)
    }
    intercept[IllegalArgumentException] {
      QuantileStore.estimateQuantiles(spark, path, "other_col",
        "2024-01-01", "2024-12-31", Seq(0.5), Lo, Hi, Bins)
    }
  }
}
