package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench drift control's harness self-test (r14 verdict #1c): point
  * BOTH sides of the interleaved disjoint-pair probe at THIS tree — the
  * measured "code factor" of a no-op diff must read ~1.0. The r14
  * control (3×A then 3×B, un-interleaved) read 1.694 on exactly this
  * comparison, which this bound would have caught before the artifact
  * shipped.
  *
  * Runs the real child-JVM machinery (6 fresh JVMs via `java -cp
  * target/scala-2.13/classes`) on a 2-query probe at sf0.001 to stay
  * CI-cheap (~2-3 min). No SparkSpec session needed — the work happens
  * in the children.
  */
class BenchDriftSpec extends AnyFunSuite {

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
        // both sides are the same bytecode: anything outside ±10% is
        // harness bias (sequencing, JVM asymmetry), not signal
        assert(m.factor >= 0.9 && m.factor <= 1.1,
          s"same-tree comparison read code_factor ${m.factor} " +
            s"(pair ratios ${m.ratios.mkString(", ")}) — the control is " +
            "measuring the harness, not the code")
    }
  }
}
