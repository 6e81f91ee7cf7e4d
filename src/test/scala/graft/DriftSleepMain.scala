package graft

/** Test stub for BenchDriftSpec's budget case: a probe child that hangs
  * forever (never writes its detail file, never exits). Launched in place
  * of graft.Bench via the Probe mainClass hook to prove the control's
  * global budget kills it and short-circuits — the r15 failure mode was
  * exactly a hung probe whose 900 s per-step timeout had no global bound
  * (BENCH_r15.json rc=124).
  */
object DriftSleepMain {
  def main(args: Array[String]): Unit = Thread.sleep(600000L)
}
