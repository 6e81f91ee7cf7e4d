package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench drift control's harness self-test (r14 verdict #1c): point
  * BOTH sides of the interleaved disjoint-pair probe at THIS tree — the
  * measured "code factor" of a no-op diff must read ~1.0. The r14
  * control (3×A then 3×B, un-interleaved) read 1.694 on exactly this
  * comparison, which this bound would have caught before the artifact
  * shipped.
  *
  * Runs the real child-JVM machinery (10 fresh JVMs — 5 concurrent A/B
  * pairs via `java -cp target/scala-2.13/classes`) on a 2-query probe at
  * sf0.001 to stay CI-cheap (~2-3 min). No SparkSpec session needed —
  * the work happens in the children.
  *
  * Second case (r15 verdict #1): the control's GLOBAL budget. A probe
  * that hangs forever must be killed at the budget and short-circuit the
  * pair loop — r15's control had only per-step 900 s timeouts, kept
  * launching pairs after the first failure, and pushed the driver's
  * whole bench past its outer timeout (BENCH_r15.json rc=124, no metric
  * line).
  */
class BenchDriftSpec extends AnyFunSuite {

  test("a hung probe is killed at the global budget and short-circuits the pair loop") {
    val t0 = System.nanoTime()
    val result = BenchDrift.interleaved(
      aClasses = "target/scala-2.13/test-classes:target/scala-2.13/classes",
      aCwd = ".",
      bClasses = "target/scala-2.13/test-classes:target/scala-2.13/classes",
      bCwd = ".",
      queries = Seq("etl_pipeline"), sfDir = "/root/testdata/sf0.001",
      cpus = "2", shuffleParts = "2", minCommon = 1, tagPrefix = "hang",
      deadlineNanos = System.nanoTime() + 10 * 1000000000L,
      mainClass = "graft.DriftSleepMain")
    val elapsed = (System.nanoTime() - t0) / 1e9
    result match {
      case Right(_) => fail("a probe that never writes a detail file cannot succeed")
      case Left(reason) =>
        // the FIRST pair's A side must be the one reported — pairs 2 and
        // 3 never launch (the r15 loop ran them all before checking)
        assert(reason.contains("hang_a1") || reason.contains("budget"),
          s"expected a first-pair short-circuit or budget bail, got: $reason")
    }
    assert(elapsed < 60,
      f"control-side wait ran $elapsed%.0f s against a 10 s budget — the clamp is broken")
  }

  test("same-tree interleaved probe reads code_factor within [0.9, 1.1]") {
    val result = BenchDrift.selfNoise(
      sfDir = "/root/testdata/sf0.001",
      queries = Seq("etl_pipeline", "price_parse"),
      cpus = "4", shuffleParts = "4")
    result match {
      case Left(reason) => fail(s"self-noise probe did not complete: $reason")
      case Right(m) =>
        assert(m.common.size == 2, s"both probe queries must survive: ${m.common}")
        assert(m.ratios.size == 5)
        assert(m.perQuery.keySet == m.common.toSet &&
          m.perQuery.values.forall(_.size == 5),
          s"per-query pair ratios must cover every common query: ${m.perQuery}")
        // both sides are the same bytecode: anything outside ±10% is
        // harness bias (sequencing, JVM asymmetry), not signal
        assert(m.factor >= 0.9 && m.factor <= 1.1,
          s"same-tree comparison read code_factor ${m.factor} " +
            s"(pair ratios ${m.ratios.mkString(", ")}) — the control is " +
            "measuring the harness, not the code")
    }
  }
}
