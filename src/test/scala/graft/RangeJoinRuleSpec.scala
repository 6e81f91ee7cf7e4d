package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The RangeJoinRewrite optimizer rule (registered via GraftExtensions,
  * so this suite's shared session has it): a naive inequality-only join
  * must plan as a bucketed equi-join with identical results.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val intervals = Seq(
    (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")),
    (2L, ts("2024-01-01 01:15:00"), ts("2024-01-01 04:45:00")),
    (3L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:01"))
  ).toDF("iv_id", "start_ts", "end_ts")
  private lazy val points = Seq(
    (10L, ts("2024-01-01 00:30:00")), (11L, ts("2024-01-01 02:00:00")),
    (12L, ts("2024-01-01 01:59:59")), (13L, ts("2024-01-01 04:44:59")),
    (14L, ts("2024-01-01 05:00:00")), (15L, ts("2024-01-01 06:00:00"))
  ).toDF("pt_id", "ts")

  private val expected = Set((10L, 1L), (12L, 1L), (12L, 2L), (11L, 2L), (13L, 2L), (14L, 3L))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pt_id", "iv_id").as[(Long, Long)].collect().toSet

  test("naive inequality-only join: rewritten to an equi-join, results identical") {
    val naive = points.join(intervals, $"ts" >= $"start_ts" && $"ts" < $"end_ts")
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n${plan.linesIterator.take(25).mkString("\n")}")
    assert(plan.contains("_graft_bucket"), "rewritten plan should carry the bucket key")
    assert(pairs(naive) == expected)
    assert(naive.count() == expected.size) // multiplicity unchanged, no dup stage
  }

  test("orientation variants rewrite too (swapped sides, flipped comparisons)") {
    val flipped = intervals.join(points, $"start_ts" <= $"ts" && $"end_ts" > $"ts")
    val plan = flipped.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(pairs(flipped) == expected)
  }

  test("inclusive upper bound keeps the boundary row") {
    val incl = points.join(intervals, $"ts" >= $"start_ts" && $"ts" <= $"end_ts")
    assert(!incl.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // point 11 sits exactly on interval 1's end — included under <=
    assert(pairs(incl) == expected + ((11L, 1L)))
  }

  test("kill switch restores the naive plan") {
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val naive = points.join(intervals, $"ts" >= $"start_ts" && $"ts" < $"end_ts")
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
      assert(pairs(naive) == expected) // same answer, terrible plan
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  test("joins with a usable equi-key are left alone") {
    val a = Seq((1L, ts("2024-01-01 01:00:00"), 5.0)).toDF("k", "ts", "v")
    val b = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"))).toDF("k", "lo", "hi")
    val j = a.join(b, a("k") === b("k") && a("ts") >= b("lo") && a("ts") < b("hi"))
    assert(!j.queryExecution.executedPlan.toString.contains("_graft_bucket"))
    assert(j.count() == 1)
  }

  test("left-outer range join rewrites when the point side is preserved") {
    val lo = points.join(intervals, $"ts" >= $"start_ts" && $"ts" < $"end_ts", "left_outer")
    val plan = lo.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire for left_outer:\n${plan.linesIterator.take(25).mkString("\n")}")
    assert(plan.contains("_graft_bucket"))
    val got = lo.select($"pt_id", $"iv_id").as[(Long, Option[Long])].collect().toSet
    // matched pairs as inner; point 15 (matches nothing) survives null-padded
    val want = expected.map { case (p, i) => (p, Some(i)) } ++ Set((15L, None: Option[Long]))
    assert(got == want)
    // exactly once per unmatched point — multiplicity is the outer-join trap
    assert(lo.count() == want.size)
  }

  test("right-outer with the point side preserved rewrites; interval-preserved outer is skipped") {
    // right_outer, point side on the right: preserved side == point side → rewrite
    val ro = intervals.join(points, $"ts" >= $"start_ts" && $"ts" < $"end_ts", "right_outer")
    val roPlan = ro.queryExecution.executedPlan.toString
    assert(!roPlan.contains("BroadcastNestedLoopJoin") && roPlan.contains("_graft_bucket"))
    assert(ro.count() == expected.size + 1) // + the unmatched point 15

    // left_outer with the INTERVAL side preserved: bucket explosion would
    // duplicate unmatched intervals → named skip, nested loop stands
    val skip = intervals.join(points, $"ts" >= $"start_ts" && $"ts" < $"end_ts", "left_outer")
    val skipPlan = skip.queryExecution.executedPlan.toString
    assert(!skipPlan.contains("_graft_bucket"), "interval-preserved outer must not rewrite")
    val got = skip.select($"iv_id", $"pt_id").as[(Long, Option[Long])].collect().toSet
    assert(got == expected.map { case (p, i) => (i, Some(p)) }) // every interval matches ≥1 point
  }

  test("semi and anti range joins rewrite when the point side probes") {
    val semi = points.join(intervals, $"ts" >= $"start_ts" && $"ts" < $"end_ts", "left_semi")
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(!semiPlan.contains("BroadcastNestedLoopJoin") && semiPlan.contains("_graft_bucket"))
    assert(semi.select("pt_id").as[Long].collect().toSet == expected.map(_._1))

    val anti = points.join(intervals, $"ts" >= $"start_ts" && $"ts" < $"end_ts", "left_anti")
    val antiPlan = anti.queryExecution.executedPlan.toString
    assert(!antiPlan.contains("BroadcastNestedLoopJoin") && antiPlan.contains("_graft_bucket"))
    assert(anti.select("pt_id").as[Long].collect().toSet == Set(15L))
  }

  test("rewritten plan equals RangeJoin.pointInInterval on a dense random fixture") {
    // 2k points × 200 intervals with spans crossing many buckets — the
    // rewrite, the explicit operator, and the (rule-disabled) naive plan
    // must agree exactly
    val pts = spark.range(2000).select(
      col("id").as("pt_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 97000000L).as("ts"))
    val ivs = spark.range(200).select(
      col("id").as("iv_id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") * 940000000L)).as("start_ts"))
      .withColumn("end_ts", timestamp_micros(
        unix_micros(col("start_ts")) + (pmod(col("iv_id") * 7919, lit(9000)) + lit(1)) * 1000000L))
    val viaRule = pts.join(ivs, col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val viaOperator = graft.operators.RangeJoin
      .pointInInterval(pts, "ts", ivs, "start_ts", "end_ts", bucketSeconds = 3600L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(viaRule == viaOperator)
    assert(viaRule.nonEmpty)
  }
}
