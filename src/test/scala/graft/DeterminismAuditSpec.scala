package graft

/** Mechanizes the two determinism conventions the r11 sf1 oracle sweep
  * found by hand (QueryDef scaladoc), so they are enforced for every
  * current entry and for entry #200:
  *
  *  - a non-total outermost ORDER BY (the `(l_orderkey, l_linenumber)`
  *    trap: unique-looking keys with 143k duplicate pairs at sf0.1) is
  *    caught by a DATA probe — every tie group of the stated sort key
  *    must contain only fully-identical rows;
  *  - a strict comparison against an unrounded float aggregate
  *    (`winsorize_stats`'s 1-ulp threshold flip) is caught by a static
  *    scan of the oracle SQL, answered either by grid-rounding the
  *    threshold in both engines or by a reasoned whitelist row.
  *
  * The probe here runs at sf0.001 on every `sbt test`;
  * `graft.DeterminismAudit.main` extends it to sf0.01 + sf0.1
  * (tools/determinism_audit_r12.json) where duplicate key pairs
  * actually appear in the data.
  */
class DeterminismAuditSpec extends SparkSpec {

  import DeterminismAudit._

  private lazy val entries = SparkEntry.catalogEntries.filter(_.oracle.isDefined)

  // ---------------------------------------------------------------- scanner unit pins

  test("outerOrderBy sees only the depth-0 tail, not window/CTE/string ORDER BYs") {
    val sql =
      """WITH x AS (SELECT a, row_number() OVER (ORDER BY b) AS rn FROM t ORDER BY a)
        |SELECT a, 'ORDER BY decoy(' AS s FROM x
        |-- ORDER BY commented_out
        |ORDER BY a DESC NULLS LAST, rn LIMIT 5""".stripMargin
    assert(sortKeyColumns(sql) == Right(Seq("a", "rn")))
    assert(sortKeyColumns("SELECT count(*) AS n FROM t") ==
      Left("no depth-0 ORDER BY in oracle SQL"))
  }

  test("normalizeKey unwraps casts, strips direction and null placement") {
    assert(normalizeKey("CAST(zval AS BIGINT) DESC") == "zval")
    assert(normalizeKey("t.col ASC") == "col")
    assert(normalizeKey("unit_price NULLS FIRST") == "unit_price")
    assert(normalizeKey("ln(u) / w DESC") == "ln(u) / w")
    assert(keyIdents("ln(u) / w") == Set("u", "w"))
  }

  test("strictFloatFlags catches the pre-fix winsorize class and accepts the grid-rounded fix") {
    val broken =
      """WITH q AS (SELECT k, quantile_cont(v, 0.05) AS lo FROM t GROUP BY k)
        |SELECT k, sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS n FROM t JOIN q USING (k)
        |GROUP BY k ORDER BY k""".stripMargin
    assert(strictFloatFlags(broken).nonEmpty, "unrounded percentile boundary must flag")
    val fixed = broken.replace("quantile_cont(v, 0.05) AS lo",
      "round(quantile_cont(v, 0.05), 6) AS lo")
    assert(strictFloatFlags(fixed).isEmpty, "grid-rounded threshold must not flag")
    val direct = "SELECT k FROM t GROUP BY k HAVING avg(v) > 1.5 ORDER BY k"
    assert(strictFloatFlags(direct).nonEmpty, "direct aggregate boundary must flag")
  }

  test("floatAggOutputGuards classifies the interval_join_agg fix and its broken form") {
    val broken = "SELECT k, round(avg(v), 4) AS a, avg(w) AS b, " +
      "sum(CAST(round(v*10000) AS BIGINT)) AS c FROM t GROUP BY k ORDER BY k"
    val g = floatAggOutputGuards(broken)
    assert(g("a") == "rounded", "round(avg) is still boundary-flippable")
    assert(g("b") == "raw")
    assert(g("c") == "int_exact", "integer-cast argument is exact arithmetic")
    val fixed = "SELECT k, round(CAST(sum(CAST(round(v*10000) AS BIGINT)) AS DOUBLE)" +
      " / 10000.0 / count(*), 4) AS a FROM t GROUP BY k ORDER BY k"
    assert(floatAggOutputGuards(fixed)("a") == "int_exact")
  }

  // ---------------------------------------------------------------- catalog-wide static scan

  test("every float-typed aggregate output column is exact-int or whitelisted (sf0.001)") {
    val flagged = entries.flatMap { qd =>
      val as = floatOutputAliases(spark, sf, qd)
      if (as.isEmpty) None else Some(qd.name -> as)
    }.toMap
    val unanswered = flagged.keySet.diff(floatOutputWhitelist.keySet)
    assert(unanswered.isEmpty,
      "float-aggregate output columns that can flip a rounded digit on summation " +
        "drift (use the exact quantized-BIGINT pattern like interval_join_agg, or " +
        "whitelist with a bounded-drift reason):\n" +
        unanswered.toSeq.sorted.map(n => s"  $n: ${flagged(n).mkString("; ")}").mkString("\n"))
    val dead = floatOutputWhitelist.keySet.diff(flagged.keySet)
    assert(dead.isEmpty, s"float-output whitelist rows no longer flagged - delete them: ${dead.mkString(", ")}")
  }

  test("every strict float-aggregate comparison in the catalog is grid-rounded or whitelisted") {
    val flagged = entries.flatMap { qd =>
      val flags = strictFloatFlags(qd.oracle.get)
      if (flags.isEmpty) None else Some(qd.name -> flags)
    }.toMap
    val unanswered = flagged.keySet.diff(strictFloatWhitelist.keySet)
    assert(unanswered.isEmpty,
      s"strict comparisons against unrounded float aggregates (grid-round the " +
        s"threshold in BOTH engines like winsorize_stats, or whitelist with a reason):\n" +
        unanswered.toSeq.sorted.map(n => s"  $n: ${flagged(n).mkString("; ")}").mkString("\n"))
    val dead = strictFloatWhitelist.keySet.diff(flagged.keySet)
    assert(dead.isEmpty, s"whitelist rows no longer flagged - delete them: ${dead.mkString(", ")}")
  }

  test("sortKeyOverride and sortKeyWhitelist rows name real catalog entries") {
    val names = entries.map(_.name).toSet
    assert(sortKeyOverride.keySet.subsetOf(names))
    assert(sortKeyWhitelist.keySet.subsetOf(names))
    // an entry cannot be both re-expressed and excused
    assert(sortKeyOverride.keySet.intersect(sortKeyWhitelist.keySet).isEmpty)
  }

  // ---------------------------------------------------------------- catalog-wide data probe

  test("every oracled entry's stated ORDER BY is total against the data (sf0.001)") {
    val audits = entries.map(qd => auditEntry(spark, sf, qd))
    val bad = audits.filter(a =>
      a.status == "VIOLATION" || a.status == "UNPARSEABLE" || a.status == "ERROR")
    assert(bad.isEmpty,
      "non-total or unauditable ORDER BY tails (see QueryDef scaladoc conventions):\n" +
        bad.map(a => s"  ${a.name}: ${a.status} ${a.detail}").mkString("\n"))
    // the probe must actually be exercising data, not whitelisting its
    // way to green: the overwhelming majority must be proven BY DATA
    val proven = audits.count(a => a.status.startsWith("total_by_data"))
    assert(proven > entries.size * 3 / 4, s"only $proven/${entries.size} data-proven")
  }
}
