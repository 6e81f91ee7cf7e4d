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

  // ---- count-min frequency store ----

  test("CMS point estimates upper-bound the exact count within the e*N/w guarantee") {
    import graft.operators.FreqSketchStore
    val ev = Tables.events(spark, sf).select($"event_type", $"ts")
    val path = java.nio.file.Files.createTempDirectory("graft-cms").toString
    FreqSketchStore.writeDailyFreqSketch(ev, "ts", "event_type", path)
    val n = ev.count()
    val exact = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    for ((k, truth) <- exact) {
      val est = FreqSketchStore.estimateFreq(spark, path, "event_type", k,
        "2024-01-01", "2024-12-31")
      assert(est >= truth, s"CMS must never undercount: $k est $est < $truth")
      assert(est <= truth + 3.0 * n / 1024,
        s"CMS overcount beyond bound on $k: est $est, truth $truth, n $n")
    }
    // an absent key collides with at most bound mass, never reports big
    val ghost = FreqSketchStore.estimateFreq(spark, path, "event_type", "no_such_type",
      "2024-01-01", "2024-12-31")
    assert(ghost <= 3.0 * n / 1024, s"ghost key estimate $ghost too large")
  }

  test("CMS sketches are linear: appended days merge to the one-shot estimates") {
    import graft.operators.FreqSketchStore
    val ev = Tables.events(spark, sf).select($"user_id", $"ts")
    val oneShot = java.nio.file.Files.createTempDirectory("graft-cms1").toString
    FreqSketchStore.writeDailyFreqSketch(ev, "ts", "user_id", oneShot)
    val incr = java.nio.file.Files.createTempDirectory("graft-cms2").toString
    FreqSketchStore.writeDailyFreqSketch(
      ev.filter(to_date($"ts") < "2024-01-16"), "ts", "user_id", incr)
    FreqSketchStore.writeDailyFreqSketch(
      ev.filter(to_date($"ts") >= "2024-01-16"), "ts", "user_id", incr, mode = "append")
    val someUser = ev.select($"user_id").head().getLong(0).toString
    val a = FreqSketchStore.estimateFreq(spark, oneShot, "user_id", someUser,
      "2024-01-01", "2024-12-31")
    val b = FreqSketchStore.estimateFreq(spark, incr, "user_id", someUser,
      "2024-01-01", "2024-12-31")
    assert(a == b && a > 0, s"one-shot $a != incremental $b (or zero)")
    // subrange reads only its days: estimate for a half-year bounds the full
    val half = FreqSketchStore.estimateFreq(spark, oneShot, "user_id", someUser,
      "2024-01-01", "2024-06-30")
    assert(half <= a, s"subrange $half > full-range $a")
  }

  test("CMS store refuses wrong key / depth / width reads") {
    import graft.operators.FreqSketchStore
    val ev = Tables.events(spark, sf).select($"event_type", $"ts")
    val path = java.nio.file.Files.createTempDirectory("graft-cms3").toString
    FreqSketchStore.writeDailyFreqSketch(ev, "ts", "event_type", path)
    intercept[IllegalArgumentException] {
      FreqSketchStore.estimateFreq(spark, path, "user_id", "1", "2024-01-01", "2024-12-31")
    }
    intercept[IllegalArgumentException] {
      FreqSketchStore.estimateFreq(spark, path, "event_type", "view",
        "2024-01-01", "2024-12-31", width = 2048)
    }
  }

  test("CMS build drops null keys/timestamps by contract instead of aborting") {
    import graft.operators.FreqSketchStore
    // a null key used to md5 to a null cell idx and blow up
    // map_from_entries ('Cannot use null as map key') — one bad event
    // aborting the whole day's sketch. Now dropped like the other
    // operators' documented null contract; estimates over the non-null
    // rows are unchanged.
    val clean = Tables.events(spark, sf).select($"event_type", $"ts").limit(500)
    val dirty = clean
      .unionByName(Seq(("x", null), (null, "2024-01-05 10:00:00"), (null, null))
        .toDF("event_type", "ts_s")
        .select($"event_type", to_timestamp($"ts_s").cast("timestamp_ntz").as("ts")))
    val pClean = java.nio.file.Files.createTempDirectory("graft-cmsn1").toString
    val pDirty = java.nio.file.Files.createTempDirectory("graft-cmsn2").toString
    FreqSketchStore.writeDailyFreqSketch(clean, "ts", "event_type", pClean)
    FreqSketchStore.writeDailyFreqSketch(dirty, "ts", "event_type", pDirty)
    val k = clean.select($"event_type").head().getString(0)
    val a = FreqSketchStore.estimateFreq(spark, pClean, "event_type", k,
      "2024-01-01", "2024-12-31")
    val b = FreqSketchStore.estimateFreq(spark, pDirty, "event_type", k,
      "2024-01-01", "2024-12-31")
    assert(a == b && a > 0, s"null rows must be invisible: clean $a vs dirty $b")
  }
}
