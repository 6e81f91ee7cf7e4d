package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, to_date}

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

  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+(?:parquet\s*\.\s*)?`([^`]+)`(?:\s+AS\s+(\w+))?""" +
      """\s+USING\s+([\w.]+)(?:\s+AS\s+(\w+))?\s+ON\s+(.+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  private val StartsMergeRe = """(?is)\s*MERGE\b.*""".r

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
      case MergeRe(path, tAlias, source, sAlias, cond) =>
        val (matched, inserted) =
          merge(spark, path, source, cond, Option(tAlias), Option(sAlias))
        matched + inserted
      case StartsMergeRe() =>
        throw new IllegalArgumentException(
          "unsupported MERGE shape — supported grammar: " +
            "MERGE INTO `<warehouse path>` [AS t] USING <view> [AS s] " +
            "ON t.k1 = s.k1 [AND ...] " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
            s"(got: ${sql.trim.take(80)})")
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

  /** MERGE-INTO for the day-partitioned parquet warehouse: routes the
    * standard row-level MERGE statement to
    * `Warehouse.upsertDayPartitioned` (last-writer-wins by key within
    * day, copy-on-write over exactly the affected day partitions).
    *
    * Grammar is the whole-row form — `UPDATE SET * / INSERT *` — because
    * that is the upsert's semantics: a matched key's row is REPLACED by
    * the source row, an unmatched one INSERTED. The ON condition must be
    * a conjunction of same-name equality predicates (`t.k = s.k`); those
    * columns become the merge identity. `day` in the ON list is accepted
    * and ignored — the warehouse derives it from the source's timestamp
    * column, which must be unique in the source schema (two timestamp
    * columns would make the day derivation ambiguous — name the intent
    * by dropping one).
    *
    * Returns (matched, inserted): matched = source rows that replaced an
    * existing (key, day) row, inserted = the rest — summed, the Postgres
    * MERGE rowcount `tab3` would display.
    */
  def merge(
      spark: SparkSession,
      path: String,
      sourceView: String,
      onCond: String,
      targetAlias: Option[String] = None,
      sourceAlias: Option[String] = None): (Long, Long) = {
    val EqRe = """(?s)\s*(?:(\w+)\s*\.\s*)?(\w+)\s*=\s*(?:(\w+)\s*\.\s*)?(\w+)\s*""".r
    // legal qualifiers: the declared aliases, or (when the source is not
    // aliased) the source view's own name — standard SQL scoping. A
    // qualifier naming neither (a typo'd table) must fail, not silently
    // key the merge.
    val aliases = Set(targetAlias, sourceAlias).flatten.map(_.toLowerCase) ++
      (if (sourceAlias.isEmpty) Set(sourceView.toLowerCase) else Set.empty[String])
    val keyCols = topLevelOnly(onCond).split("(?i)\\s+AND\\s+").toSeq.map {
      case EqRe(a1, c1, a2, c2) =>
        require(c1.equalsIgnoreCase(c2),
          s"MERGE ON predicates must equate the SAME column on both sides " +
            s"(the upsert key identity); got '$c1 = $c2'")
        Seq(a1, a2).filter(_ != null).foreach(a =>
          require(aliases.contains(a.toLowerCase),
            s"unknown alias '$a' in MERGE ON condition (known: ${aliases.mkString(", ")})"))
        c1
      case other =>
        throw new IllegalArgumentException(
          "MERGE ON must be a conjunction of equality predicates " +
            s"(t.k = s.k AND ...); got '${other.trim}'")
    }.filterNot(_.equalsIgnoreCase("day")).distinct
    require(keyCols.nonEmpty,
      "MERGE ON names only the derived 'day' column — at least one real key is required")

    // SCHEMA validation runs before any action: a structurally invalid
    // statement (two timestamp columns, a key that is not a source
    // column) must fail on a quiet day too, not first in production
    // when rows finally arrive
    val source = spark.table(sourceView)
    val tsCols = source.schema.fields
      .filter(f => f.dataType.typeName.startsWith("timestamp")).map(_.name)
    require(tsCols.length == 1,
      s"warehouse MERGE derives the day partition from THE timestamp column of " +
        s"'$sourceView', which must be unique (found: ${tsCols.mkString(", ")})")
    val tsCol = tsCols.head
    keyCols.foreach(k => require(source.columns.map(_.toLowerCase).contains(k.toLowerCase),
      s"MERGE key '$k' is not a column of '$sourceView'"))

    // materialize the source ONCE: the matched/inserted split takes two
    // actions and the upsert a third — re-evaluating an expensive (or
    // nondeterministic) view per action could report counts that disagree
    // with the rows actually written. persist + unpersist (not
    // localCheckpoint): repeated MERGEs in a long session must not
    // accumulate unreclaimable executor blocks
    val updates = source.persist()
    try {
      val total = updates.count()
      if (total == 0L) return (0L, 0L) // empty batch: MERGE affects 0 rows, never throws

      // matched/inserted split BEFORE the rewrite (the post-state can't
      // distinguish them): key-semi-join against only the affected days —
      // the same partition-pruned read the upsert itself performs
      val up = updates.withColumn("day", to_date(col(tsCol)))
      val days = up.select(col("day")).distinct().collect().map(_.get(0))
      val current = spark.read.option("mergeSchema", "true").parquet(path)
        .filter(col("day").isin(days: _*))
      val matched = up.join(current.select((keyCols :+ "day").map(col): _*),
        keyCols :+ "day", "left_semi").count()
      val inserted = total - matched

      graft.sources.Warehouse.upsertDayPartitioned(spark, path, updates, tsCol, keyCols)
      (matched, inserted)
    } finally {
      updates.unpersist()
      ()
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
