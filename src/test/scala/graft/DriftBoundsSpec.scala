package graft

/** Pins the transcendental-whitelist drift certificates (DriftBounds
  * scaladoc) on every sbt test: for each of the 4 whitelisted entries,
  * every output row's distance to its nearest round(4) boundary must
  * exceed Safety × its worst-case cross-engine drift bound, and the
  * probe must reproduce the entry's rounded output exactly. Measured
  * margins at sf0.001 are 3+ orders of magnitude above the bound
  * (closest: bigram_lm_perplexity at ~1.6e3×), so a failure here means
  * the corpus or the aggregate changed shape, not noise.
  */
class DriftBoundsSpec extends SparkSpec {

  test("all 4 transcendental whitelist entries carry a passing round(4) absorption certificate") {
    val results = DriftBounds.runAll(spark, sf)
    assert(results.keySet == DeterminismAudit.floatOutputWhitelist.keySet,
      "DriftBounds probes must cover exactly the floatOutputWhitelist rows: " +
        s"probes=${results.keySet} whitelist=${DeterminismAudit.floatOutputWhitelist.keySet}")
    for ((entry, (rows, minRatio, fidelity, pass)) <- results) {
      assert(rows > 0, s"$entry: certificate covered no rows")
      assert(fidelity == 0,
        s"$entry: probe does not reproduce the entry's rounded output ($fidelity rows differ)")
      assert(pass && minRatio >= DriftBounds.Safety,
        f"$entry: min boundary-distance / drift ratio $minRatio%.1f < ${DriftBounds.Safety}")
    }
  }
}
