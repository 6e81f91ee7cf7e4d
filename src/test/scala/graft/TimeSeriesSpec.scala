package graft

import graft.analytics.TimeSeries
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("range join: bucketed result equals the brute-force inequality join") {
    // intervals deliberately cross bucket (hour) boundaries, end exactly
    // on boundaries, and overlap each other
    val intervals = Seq(
      (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")), // ends ON boundary
      (2L, ts("2024-01-01 01:15:00"), ts("2024-01-01 04:45:00")), // crosses 3 boundaries
      (3L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:01")) // sub-bucket
    ).toDF("iv_id", "start_ts", "end_ts")
    val points = Seq(
      (10L, ts("2024-01-01 00:30:00")), // == start of 1 → included
      (11L, ts("2024-01-01 02:00:00")), // == end of 1 → EXCLUDED, inside 2
      (12L, ts("2024-01-01 01:59:59")), // inside 1 and 2
      (13L, ts("2024-01-01 04:44:59")), // tail of 2
      (14L, ts("2024-01-01 05:00:00")), // start of 3
      (15L, ts("2024-01-01 06:00:00")) // matches nothing
    ).toDF("pt_id", "ts")

    val got = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter($"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want == Set((10L, 1L), (12L, 1L), (12L, 2L), (11L, 2L), (13L, 2L), (14L, 3L)))
    // no duplicate (point, interval) pairs: each pair meets in exactly one bucket
    val n = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts").count()
    assert(n == want.size)
  }

  test("range join is bucket-width invariant (spans far above and below the bucket)") {
    val pts = spark.range(500).select(
      col("id").as("pt_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 173000000L).as("ts"))
    val ivs = spark.range(60).select(
      col("id").as("iv_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1390000000L).as("start_ts"))
      .withColumn("end_ts", timestamp_micros(
        unix_micros(col("start_ts")) + (pmod(col("iv_id") * 7919, lit(12000)) + lit(5)) * 1000000L))
    def run(bucket: Long) = graft.operators.RangeJoin
      .pointInInterval(pts, "ts", ivs, "start_ts", "end_ts", bucketSeconds = bucket)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val truth = pts.crossJoin(ivs)
      .filter($"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    // 60 s buckets: spans up to 12000 s explode into ~200 buckets each;
    // 86400 s buckets: every interval sits in 1-2 buckets. Same answer.
    assert(run(60L) == truth)
    assert(run(3600L) == truth)
    assert(run(86400L) == truth)
    assert(truth.nonEmpty)
  }

  test("gap-fill: missing days materialized, flagged, forward-filled") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-02 09:00:00"), 20.0),
      (1L, ts("2024-01-02 18:00:00"), 25.0), // close of day 2
      (1L, ts("2024-01-04 12:00:00"), 40.0),
      (1L, ts("2024-01-06 12:00:00"), 60.0),
      (2L, ts("2024-01-03 12:00:00"), 99.0) // single-day key: no gaps
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFillDaily(events, "user_id", "ts", "value")
      .select($"user_id", $"day".cast("string"), $"is_gap", $"filled")
      .as[(Long, String, Boolean, Double)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", false, 10.0),
      (1L, "2024-01-02", false, 25.0), // last tick of the day wins
      (1L, "2024-01-03", true, 25.0), // gap → carried
      (1L, "2024-01-04", false, 40.0),
      (1L, "2024-01-05", true, 40.0),
      (1L, "2024-01-06", false, 60.0),
      (2L, "2024-01-03", false, 99.0)))
  }

  test("ewma: adjust=true weights, hand-computed") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1.0),
      (1L, ts("2024-01-01 00:00:02"), 2.0),
      (1L, ts("2024-01-01 00:00:03"), 3.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.ewma(events, "user_id", "ts", "value", alpha = 0.5, window = 10)
      .orderBy("ts").select("ewma").as[Double].collect().toSeq
    // e1=1; e2=(2+0.5·1)/1.5; e3=(3+0.5·2+0.25·1)/1.75
    assert(got == Seq(1.0, 1.6667, 2.4286))
  }

  test("snapshot diff: insert/delete/update classified, null-safe, unchanged dropped") {
    val a = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, Some(40.0)))
      .toDF("k", "v")
    val b = Seq((1L, Some(10.0)), (2L, Some(25.0)), (3L, Some(30.0)), (5L, Some(50.0)))
      .toDF("k", "v")
    val got = graft.operators.SnapshotDiff.diff(a, b, Seq("k"))
      .select("k", "status").as[(Long, String)].collect().toSet
    assert(got == Set(
      (2L, "update"), // value changed
      (3L, "update"), // null → value is a change (null-safe compare)
      (4L, "delete"),
      (5L, "insert"))) // row 1 unchanged → absent
  }

  test("funnel stages: only in-order progressions count") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 01:00:00")), // A: full funnel in order
      (1L, "click", ts("2024-01-01 02:00:00")),
      (1L, "purchase", ts("2024-01-01 03:00:00")),
      (2L, "click", ts("2024-01-01 01:00:00")), // B: click BEFORE view → stage 1
      (2L, "view", ts("2024-01-01 02:00:00")),
      (3L, "view", ts("2024-01-01 01:00:00")), // C: view only
      (4L, "view", ts("2024-01-01 01:00:00")), // D: purchase before click → stage 2
      (4L, "purchase", ts("2024-01-01 01:30:00")),
      (4L, "click", ts("2024-01-01 02:00:00")),
      (5L, "purchase", ts("2024-01-01 01:00:00")) // E: no view → absent
    ).toDF("user_id", "event_type", "ts")
    ev.createOrReplaceTempView("funnel_fixture")
    val v = ev.filter($"event_type" === "view").groupBy("user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click").join(v, Seq("user_id"))
      .filter($"ts" > $"t_view").groupBy("user_id").agg(min($"ts").as("t_click"))
    val p = ev.filter($"event_type" === "purchase").join(c, Seq("user_id"))
      .filter($"ts" > $"t_click").groupBy("user_id").agg(min($"ts").as("t_purchase"))
    val stages = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id",
        (lit(1) + $"t_click".isNotNull.cast("int") + $"t_purchase".isNotNull.cast("int")).as("stages"))
      .as[(Long, Int)].collect().toMap
    assert(stages == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("hopping windows: boundary events land in exactly ceil(window/hop) windows (property)") {
    // the off-by-one every hopping implementation gets wrong once: an
    // event at an EXACT hop boundary t (t % hop == 0) belongs to the
    // windows starting at t, t-hop, …, down to t-window EXCLUSIVE —
    // that's ceil(window/hop) of them, because [s, s+window) is
    // half-open. Off-boundary events may see one fewer when hop does
    // not divide window. Checked against Spark's own window(ts, w, h)
    // for generated (hop, window) shapes, divisible and ragged.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCfg = for {
      hop <- Gen.choose(1, 12)
      mult <- Gen.choose(1, 4)
      extra <- Gen.choose(0, hop - 1)
    } yield (hop, hop * mult + extra)
    val prop = Prop.forAll(genCfg) { case (hop, win) =>
      def ceilDiv(a: Int, b: Int) = (a + b - 1) / b
      // battery: 4 boundary timestamps and their +1 s off-boundary
      // shadows (when hop > 1), well past t=0 so every window exists
      val ts = (10 to 13).flatMap { m =>
        val t = (m + win / hop) * hop
        Seq(t) ++ (if (hop > 1) Seq(t + 1) else Nil)
      }.distinct
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t.toLong) }
        .toDF("id", "t")
        .select($"id", $"t", timestamp_seconds($"t").as("ets"))
      val counts = df
        .select($"id", window($"ets", s"$win seconds", s"$hop seconds"))
        .groupBy($"id").count()
        .join(df, Seq("id"))
        .select($"t", $"count").as[(Long, Long)].collect().toMap
      ts.forall { t =>
        // multiples of hop in the half-open (t-window, t]
        val want = t / hop - (t - win) / hop
        val bound = if (t % hop == 0)
          want == ceilDiv(win, hop) else true
        counts(t.toLong) == want && bound
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(result.passed, result.status.toString)
  }

  test("drawdown: peak is running max, dd is fraction off peak") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:01"), 10.0),
      (1L, ts("2024-01-01 00:00:02"), 5.0),
      (1L, ts("2024-01-01 00:00:03"), 20.0),
      (1L, ts("2024-01-01 00:00:04"), 10.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.drawdown(events, "user_id", "ts", "value")
      .orderBy("ts").select("peak", "dd").as[(Double, Double)].collect().toSeq
    assert(got == Seq((10.0, 0.0), (10.0, 0.5), (20.0, 0.0), (20.0, 0.5)))
  }

  test("linear interpolation: straight line between anchors, nearest anchor at the edges") {
    // anchors on day 1 (10.0) and day 4 (40.0); days 2, 3 interpolate to
    // 20, 30; a lone trailing anchor day 6 (60.0) leaves day 5 between
    // anchors (48? no — between 40@4 and 60@6 → 50). Leading/trailing
    // edges need a second key: key "b" observes only day 2, so its spine
    // is that single day (no gaps to fill).
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 12:00:00")
    val df = Seq(
      ("a", ts(1), 10.0), ("a", ts(4), 40.0), ("a", ts(6), 60.0),
      ("b", ts(2), 7.0)
    ).toDF("key", "ts", "value")
    val got = graft.analytics.TimeSeries.interpolateDaily(df, "key", "ts", "value")
      .select($"key", dayofmonth($"day").as("d"), $"is_gap", round($"interp", 4).as("v"))
      .orderBy("key", "d")
      .as[(String, Int, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 1, false, 10.0), ("a", 2, true, 20.0), ("a", 3, true, 30.0),
      ("a", 4, false, 40.0), ("a", 5, true, 50.0), ("a", 6, false, 60.0),
      ("b", 2, false, 7.0)))
  }

  test("ACF: constant series yields null correlation, alternating series is near -1 at lag 1") {
    // corr is undefined at zero variance — the entry must surface null,
    // not NaN/crash; a perfectly alternating series pins the sign
    def row(i: Int, v: Double) =
      (1L, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), v)
    val const = (0 until 10).map(i => row(i, 5.0)).toDF("user_id", "ts", "value")
    val constAcf = SparkEntryTestHooks.acfOf(spark, const)
    assert(constAcf.forall(_.isEmpty), s"constant series must have undefined ACF: $constAcf")
    val alt = (0 until 10).map(i => row(i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("user_id", "ts", "value")
    val altAcf = SparkEntryTestHooks.acfOf(spark, alt)
    assert(altAcf.head.exists(v => math.abs(v + 1.0) < 1e-6), s"lag-1 ACF of alternation: $altAcf")
  }
}

/** Test-only seam: the acf_lags aggregation over an arbitrary events
  * frame (the catalog entry binds it to the testdata read).
  */
object SparkEntryTestHooks {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  def acfOf(spark: SparkSession, events: DataFrame): Seq[Option[Double]] = {
    val r = graft.analytics.TimeSeries.acfLags(events, "user_id", "ts", "value").head()
    (0 until 3).map(i => if (r.isNullAt(i + 2)) None else Some(r.getDouble(i + 2)))
  }
}
