package graft

/** Diffs every catalog entry's physical-plan fingerprint against the
  * checked-in pin (tools/plan_fingerprints.json) — the regression gate
  * that catches a broadcast join silently decaying to SortMergeJoin, an
  * extra Exchange sneaking into a one-shuffle kernel, or a TakeOrdered
  * tail turning into a global sort, none of which a correctness sweep
  * can see. Intentional plan changes are re-pinned with:
  *
  *   tools/run_main.sh graft.PlanFingerprints
  *
  * and reviewed in the diff of the json (that review IS the whitelist:
  * a flipped strategy must be visible in the commit, not silent).
  */
class PlanFingerprintSpec extends SparkSpec {

  private lazy val pinned: Map[String, String] = {
    val path = java.nio.file.Paths.get(PlanFingerprints.defaultOut)
    assert(java.nio.file.Files.exists(path),
      s"missing ${PlanFingerprints.defaultOut} — generate with tools/run_main.sh graft.PlanFingerprints")
    val text = java.nio.file.Files.readString(path)
    // the file is flat {"name": "fp", ...} written by PlanFingerprints
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("every catalog entry's physical plan shape matches the pinned fingerprint") {
    val entries = SparkEntry.catalogEntries.sortBy(_.name)
    val missing = entries.map(_.name).filterNot(pinned.contains)
    val stale = pinned.keySet -- entries.map(_.name).toSet
    val drifted = entries.flatMap { qd =>
      pinned.get(qd.name).flatMap { want =>
        val got =
          try PlanFingerprints.fingerprint(qd.run(spark, sf))
          catch { case e: Exception => s"ERROR:${e.getClass.getSimpleName}:${e.getMessage.take(120)}" }
        if (got == want) None else Some(s"${qd.name}:\n  pinned: $want\n  got:    $got")
      }
    }
    val problems =
      (if (missing.nonEmpty) Seq(s"entries missing from pin (regenerate): ${missing.mkString(", ")}") else Nil) ++
        (if (stale.nonEmpty) Seq(s"pinned names not in catalog (regenerate): ${stale.mkString(", ")}") else Nil) ++
        drifted
    assert(problems.isEmpty,
      "plan-shape drift — if intentional, re-pin via tools/run_main.sh graft.PlanFingerprints and review the json diff:\n" +
        problems.mkString("\n"))
  }
}
