package graft.sql

import org.apache.spark.sql.SparkSession

/** UPDATE/DELETE for the ad-hoc SQL surface (S7 completion — reference
  * `dashboard/tabs/tab3.py:41-100` forwards arbitrary DML to Postgres and
  * returns the affected rowcount; `etl/etl.py:817-823` `clean_database`
  * is the canonical caller with one DELETE, one UPDATE, one
  * DELETE-with-subquery).
  *
  * Plain parquet catalog tables have no row-level mutation, so the two
  * statement shapes are rewritten COPY-ON-WRITE — the same physical
  * strategy a transactional lakehouse format applies, spelled out:
  *
  *  - `DELETE FROM t WHERE c`      → keep rows where `c` is FALSE or NULL
  *    (Postgres deletes only where the predicate is TRUE);
  *  - `UPDATE t SET col = e WHERE c` → `CASE WHEN coalesce(c, false)
  *    THEN e ELSE col END` over every row.
  *
  * The surviving/updated rows land in a staging directory first, then
  * `INSERT OVERWRITE` the table FROM the staging read — Spark (correctly)
  * refuses a plan that overwrites the files it is reading, and the
  * two-pass write is exactly the cost a copy-on-write DELETE pays at any
  * scale (both passes distributed, nothing driver-side). Affected
  * rowcount is measured with one predicate scan before the rewrite,
  * matching the reference's cursor.rowcount contract.
  *
  * Supported surface = the reference's statement forms: single-table,
  * single-assignment, no joins in DML (Postgres `UPDATE ... FROM` was
  * never used by the reference). UPDATE/DELETE texts OUTSIDE that grammar
  * (multi-assignment SET, UPDATE ... FROM, DELETE USING, DELETE without
  * WHERE, multi-statement strings) are REJECTED with a clear error — a
  * silent fall-through to `spark.sql` would either throw an opaque parse
  * error or, worse, execute with different semantics than the caller's
  * Postgres-shaped intent. Non-DML statements pass through untouched.
  */
object Dml {

  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(\w+)\s*=\s*(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  // shapes the copy-on-write rewrite does NOT support, matched so the
  // error names what was wrong instead of echoing a Spark parse failure
  private val UpdateFromRe = """(?is)\s*UPDATE\s+.+?\s+FROM\s+.*""".r
  private val DeleteUsingRe = """(?is)\s*DELETE\s+FROM\s+[\w.]+\s+USING\s+.*""".r
  private val StartsDmlRe = """(?is)\s*(UPDATE|DELETE)\b.*""".r

  /** Execute ONE statement; returns affected rowcount for DELETE/UPDATE,
    * result row count for anything else (the tab3 display contract).
    */
  def execute(spark: SparkSession, sql: String): Long = {
    require(!sql.trim.stripSuffix(";").contains(";"),
      "Dml.execute takes exactly one statement; split multi-statement " +
        "strings at ';' and execute each separately")
    sql match {
      case DeleteRe(table, cond) =>
        rewrite(spark, table, cond,
          selectList = "*",
          keepPredicate = Some(s"NOT coalesce(($cond), false)"))
      case UpdateRe(table, setCol, setExpr, cond) =>
        // a comma at paren/quote depth 0 in the SET clause means a second
        // assignment — function-call commas (coalesce(a, 0)) sit inside
        // parens and pass; a top-level FROM means Postgres's joined
        // UPDATE ... FROM, which the regex would otherwise swallow into
        // the SET expression (subquery FROMs sit inside parens and pass)
        val setTop = topLevelOnly(setExpr)
        require(!setTop.contains(","),
          "multi-assignment UPDATE (SET a = ..., b = ...) is not supported: " +
            "issue one single-assignment UPDATE per column " +
            s"(got: ${sql.trim.take(80)})")
        if ("""(?i)\bFROM\b""".r.findFirstIn(setTop).isDefined)
          throw new IllegalArgumentException(
            "joined DML (UPDATE ... FROM / DELETE ... USING) is not supported: " +
              "rewrite as a single-table statement with a subquery predicate " +
              s"(got: ${sql.trim.take(80)})")
        val cols = spark.table(table).columns
        require(cols.contains(setCol), s"unknown column $setCol in $table")
        val projected = cols.map { c =>
          if (c == setCol) s"CASE WHEN coalesce(($cond), false) THEN ($setExpr) ELSE $c END AS $c"
          else c
        }.mkString(", ")
        rewrite(spark, table, cond, selectList = projected, keepPredicate = None)
      case UpdateFromRe() | DeleteUsingRe() =>
        throw new IllegalArgumentException(
          "joined DML (UPDATE ... FROM / DELETE ... USING) is not supported: " +
            "rewrite as a single-table statement with a subquery predicate " +
            s"(got: ${sql.trim.take(80)})")
      case StartsDmlRe(verb) =>
        throw new IllegalArgumentException(
          s"unsupported $verb shape — supported grammar: " +
            "'DELETE FROM t WHERE cond' and 'UPDATE t SET col = expr WHERE cond' " +
            "(single table, single assignment, WHERE required; " +
            s"got: ${sql.trim.take(80)})")
      case other =>
        spark.sql(other).count()
    }
  }

  /** `s` with parenthesized groups and quoted literals blanked out — what
    * survives is the top-level token stream, so a comma in it is a second
    * SET assignment and a FROM in it is a joined UPDATE.
    */
  private def topLevelOnly(s: String): String = {
    val b = new StringBuilder(s.length)
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      if (inQuote) { if (c == '\'') inQuote = false; b += ' ' }
      else c match {
        case '\'' => inQuote = true; b += ' '
        case '(' => depth += 1; b += ' '
        case ')' => depth -= 1; b += ' '
        case _ => b += (if (depth == 0) c else ' ')
      }
    }
    b.toString
  }

  private def rewrite(
      spark: SparkSession,
      table: String,
      cond: String,
      selectList: String,
      keepPredicate: Option[String]): Long = {
    val affected = spark.sql(
      s"SELECT COUNT(*) FROM $table WHERE coalesce(($cond), false)")
      .head().getLong(0)
    if (affected == 0L) return 0L
    val stage = java.nio.file.Files.createTempDirectory("graft-dml").toString
    try {
      val where = keepPredicate.map(p => s" WHERE $p").getOrElse("")
      spark.sql(s"SELECT $selectList FROM $table$where")
        .write.mode("overwrite").parquet(stage)
      spark.read.parquet(stage).createOrReplaceTempView("graft_dml_stage")
      spark.sql(s"INSERT OVERWRITE TABLE $table SELECT * FROM graft_dml_stage")
      affected
    } finally {
      spark.catalog.dropTempView("graft_dml_stage")
      deleteRecursively(new java.io.File(stage))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
