package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan

/** Per-entry PHYSICAL-PLAN-SHAPE regression pin.
  *
  * The catalog's scale posture lives in plan shapes: a dimension join
  * must stay a BroadcastHashJoin, a bucketed range join must not decay
  * to BroadcastNestedLoop, a one-exchange kernel must not grow a second
  * shuffle. CORRECTNESS sweeps cannot see such a flip (the result is
  * identical, just 100× slower at scale), and `.explain` prose in
  * PLANS.md is only as fresh as the last human read. This pins a compact
  * fingerprint — counts of the scale-relevant physical operators — for
  * EVERY catalog entry, checked by PlanFingerprintSpec on every
  * `sbt test`.
  *
  * The fingerprint deliberately counts only operators with a scale story
  * (join strategies, exchanges, aggregates, sorts, windows, scans,
  * generates, limits, typed-object boundaries): a refactor that merely
  * reshuffles Projects/Filters does not churn the pin, but one that
  * flips a join strategy, adds an exchange, or drops a TakeOrdered tail
  * fails loudly. Intentional changes are re-pinned by regenerating:
  *
  *   tools/run_main.sh graft.PlanFingerprints [sfDir] [outJson]
  *
  * Fingerprints are taken from `queryExecution.sparkPlan` — the
  * statically selected physical plan, BEFORE adaptive re-optimization —
  * at sf0.001, with the SAME shuffle-partitions/AQE session config the
  * spec uses, so the pin is deterministic for a given code + Spark
  * version + data. (AQE may still improve things at runtime; the pin
  * guards the static strategy the optimizer would start from.)
  */
object PlanFingerprints {

  /** Physical operators with a scale story → short fingerprint keys.
    * Anything not listed is shape-neutral by policy (Project, Filter,
    * codegen wrappers, InputAdapter...).
    */
  private val interesting: Map[String, String] = Map(
    "BroadcastHashJoinExec" -> "bhj",
    "SortMergeJoinExec" -> "smj",
    "ShuffledHashJoinExec" -> "shj",
    "BroadcastNestedLoopJoinExec" -> "bnlj",
    "CartesianProductExec" -> "cartesian",
    "ShuffleExchangeExec" -> "shuffle",
    "BroadcastExchangeExec" -> "broadcast",
    "ReusedExchangeExec" -> "reuse",
    "HashAggregateExec" -> "hashagg",
    "ObjectHashAggregateExec" -> "objagg",
    "SortAggregateExec" -> "sortagg",
    "SortExec" -> "sort",
    "WindowExec" -> "window",
    "WindowGroupLimitExec" -> "wingrouplimit",
    "TakeOrderedAndProjectExec" -> "topk",
    "GenerateExec" -> "generate",
    "ExpandExec" -> "expand",
    "UnionExec" -> "union",
    "GlobalLimitExec" -> "limit",
    "FileSourceScanExec" -> "scan",
    "LocalTableScanExec" -> "localscan",
    "RDDScanExec" -> "rddscan",
    "ExternalRDDScanExec" -> "rddscan",
    "MapPartitionsExec" -> "typed",
    "MapGroupsExec" -> "typed",
    "MapElementsExec" -> "typed",
    "FlatMapGroupsInRowLevelExec" -> "typed",
    "AggregateInPandasExec" -> "typed")

  /** Compact shape fingerprint: sorted `key=count` pairs of the
    * interesting operators (subquery plans included).
    */
  def fingerprint(df: DataFrame): String = {
    val names = df.queryExecution.sparkPlan.collectWithSubqueries {
      case p: SparkPlan => p.getClass.getSimpleName
    }
    names.flatMap(interesting.get)
      .groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
      .map { case (k, n) => s"$k=$n" }
      .mkString(" ")
  }

  val defaultOut = "tools/plan_fingerprints.json"

  def sessionFor(sfDir: String): SparkSession = {
    // MUST mirror PlanFingerprintSpec's session knobs: static plan
    // selection depends on shuffle partitions + broadcast threshold
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def computeAll(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    SparkEntry.catalogEntries.sortBy(_.name).map { qd =>
      qd.name -> (try fingerprint(qd.run(spark, sfDir))
      catch { case e: Exception => s"ERROR:${e.getClass.getSimpleName}" })
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else defaultOut
    val spark = sessionFor(sfDir)
    val fps = computeAll(spark, sfDir)
    val json = fps.map { case (n, f) => s"""  "$n": "$f"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[plan-fp] wrote $out (${fps.size} entries)")
    val errs = fps.filter(_._2.startsWith("ERROR:"))
    errs.foreach { case (n, e) => println(s"[plan-fp]   $n: $e") }
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
