package graft

import graft.sql.{Markets, Views}
import org.apache.spark.sql.functions._

/** S7/X4 writable SQL surface: DDL (CREATE TABLE), DML (INSERT), and the
  * static markets dimension, all through `spark.sql`.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("markets literal dimension joins against prefix-normalized symbols") {
    Markets.register(spark)
    val syms = Seq("1rPAAA", "1zBBB", "FF55-CCC", "PLAIN").toDF("symbol")
    syms.createOrReplaceTempView("raw_syms")
    val out = spark.sql("""
      SELECT s.symbol, m.alias
      FROM raw_syms s LEFT JOIN markets m
        ON m.boursorama <> '' AND s.symbol LIKE m.boursorama || '%'
      ORDER BY s.symbol
    """).collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("1rPAAA").contains("paris"))
    assert(out("1zBBB").contains("xetra"))
    assert(out("FF55-CCC").contains("madrid"))
    assert(out("PLAIN").isEmpty)
  }

  test("DDL + DML passthrough: CREATE TABLE, INSERT INTO, query back") {
    val loc = java.nio.file.Files.createTempDirectory("graft-ddl").resolve("daystocks")
    spark.sql(s"""
      CREATE TABLE graft_daystocks (day DATE, cid BIGINT, close DOUBLE)
      USING PARQUET LOCATION '${loc.toString}'
    """)
    try {
      spark.sql("INSERT INTO graft_daystocks VALUES (DATE'2024-01-01', 1, 10.5), (DATE'2024-01-02', 1, 11.0)")
      spark.sql("INSERT INTO graft_daystocks SELECT day, cid, close FROM graft_daystocks WHERE close > 10.6")
      val n = spark.sql("SELECT COUNT(*) FROM graft_daystocks").as[Long].head()
      assert(n == 3)
      val maxClose = spark.sql("SELECT max(close) FROM graft_daystocks").as[Double].head()
      assert(maxClose == 11.0)
    } finally spark.sql("DROP TABLE graft_daystocks")
  }

  test("UPDATE/DELETE passthrough replays the reference's clean_database statements") {
    import graft.sql.Dml
    val loc = java.nio.file.Files.createTempDirectory("graft-dml-spec")
    spark.sql(s"""
      CREATE TABLE stocks (cid BIGINT, value DOUBLE, volume BIGINT)
      USING PARQUET LOCATION '${loc.resolve("stocks")}'
    """)
    spark.sql(s"""
      CREATE TABLE companies (id BIGINT, name STRING)
      USING PARQUET LOCATION '${loc.resolve("companies")}'
    """)
    try {
      spark.sql("""INSERT INTO stocks VALUES
        (1, 10.0, 100), (1, -5.0, 50), (1, NULL, 10), (1, 200000.0, 7),
        (2, 20.0, -3), (9, 30.0, 5)""")
      spark.sql("INSERT INTO companies VALUES (1, 'a'), (2, 'b')")
      // the reference's three statements, verbatim (etl/etl.py:817-823)
      val d1 = Dml.execute(spark,
        "DELETE FROM stocks WHERE value <= 0 OR value IS NULL OR value > 100000")
      val d2 = Dml.execute(spark, "UPDATE stocks SET volume = 0 WHERE volume < 0")
      val d3 = Dml.execute(spark,
        "DELETE FROM stocks WHERE cid NOT IN (SELECT id FROM companies)")
      assert(d1 == 3) // -5.0, NULL, 200000.0 rows removed
      assert(d2 == 1) // volume -3 zeroed
      assert(d3 == 1) // cid 9 orphan removed
      val left = spark.sql("SELECT cid, value, volume FROM stocks ORDER BY cid")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(left == Seq((1L, 10.0, 100L), (2L, 20.0, 0L)))
    } finally {
      spark.sql("DROP TABLE stocks")
      spark.sql("DROP TABLE companies")
    }
  }

  test("Dml rejects unsupported statement shapes loudly, accepts comma-in-expr updates") {
    import graft.sql.Dml
    val loc = java.nio.file.Files.createTempDirectory("graft-dml-neg")
    spark.sql(s"""
      CREATE TABLE dml_neg (cid BIGINT, value DOUBLE, volume BIGINT)
      USING PARQUET LOCATION '${loc.resolve("dml_neg")}'
    """)
    try {
      spark.sql("INSERT INTO dml_neg VALUES (1, 10.0, NULL), (2, 20.0, 5)")
      def rejects(stmt: String, fragment: String): Unit = {
        val e = intercept[IllegalArgumentException](Dml.execute(spark, stmt))
        assert(e.getMessage.contains(fragment), s"$stmt -> ${e.getMessage}")
      }
      rejects("UPDATE dml_neg SET value = 1, volume = 2 WHERE cid = 1", "multi-assignment")
      rejects("UPDATE dml_neg SET value = o.v FROM other o WHERE o.id = cid", "joined DML")
      rejects("DELETE FROM dml_neg USING other o WHERE o.id = cid", "joined DML")
      rejects("DELETE FROM dml_neg", "WHERE required")
      rejects("UPDATE dml_neg SET value = 0", "WHERE required")
      rejects("DELETE FROM dml_neg WHERE cid = 1; DELETE FROM dml_neg WHERE cid = 2",
        "one statement")
      // a function-call comma inside the SET expression is NOT a second
      // assignment — the reject must not over-trigger
      val n = Dml.execute(spark,
        "UPDATE dml_neg SET volume = coalesce(volume, 0) WHERE volume IS NULL")
      assert(n == 1)
      val vols = spark.sql("SELECT volume FROM dml_neg ORDER BY cid")
        .collect().map(_.getLong(0)).toSeq
      assert(vols == Seq(0L, 5L))
      // trailing semicolon on a single statement is fine
      assert(Dml.execute(spark, "DELETE FROM dml_neg WHERE cid = 2;") == 1)
    } finally spark.sql("DROP TABLE dml_neg")
  }

  test("MERGE INTO reaches the warehouse upsert: SQL == direct call, rowcounts returned") {
    import graft.sql.Dml
    import graft.sources.{Sources, Warehouse}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def mkWarehouse(): String = {
      val path = java.nio.file.Files.createTempDirectory("graft-merge-wh").toString
      val ticks = Seq(
        (1L, ts("2024-01-01 10:00:00"), 10.0),
        (2L, ts("2024-01-01 11:00:00"), 11.0),
        (1L, ts("2024-01-02 10:00:00"), 20.0),
        (2L, ts("2024-01-02 11:00:00"), 21.0)
      ).toDF("user_id", "ts", "value")
      Sources.writeDayPartitioned(ticks, "ts", "user_id", path)
      path
    }
    val updates = Seq(
      (1L, ts("2024-01-02 15:00:00"), 99.0), // replaces (1, day2)
      (7L, ts("2024-01-02 16:00:00"), 77.0) // new key on day2
    ).toDF("user_id", "ts", "value")
    updates.createOrReplaceTempView("merge_upd")

    val viaSql = mkWarehouse()
    val n = Dml.execute(spark,
      s"""MERGE INTO `$viaSql` AS t USING merge_upd AS s
          ON t.user_id = s.user_id AND t.day = s.day
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(n == 2) // 1 matched + 1 inserted — the tab3 rowcount contract
    assert(Dml.merge(spark, mkWarehouse(), "merge_upd", "t.user_id = s.user_id",
      Some("t"), Some("s")) == ((1L, 1L)))

    val viaCall = mkWarehouse()
    Warehouse.upsertDayPartitioned(spark, viaCall, updates, "ts", Seq("user_id"))
    def state(p: String) = spark.read.parquet(p)
      .select($"user_id", $"value", $"day".cast("string"))
      .as[(Long, Double, String)].collect().toSet
    assert(state(viaSql) == state(viaCall))
    assert(state(viaSql).contains((1L, 99.0, "2024-01-02")))

    // shape rejections name the problem, not a Spark parse error
    def rejects(stmt: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](Dml.execute(spark, stmt))
      assert(e.getMessage.contains(fragment), s"$stmt -> ${e.getMessage}")
    }
    rejects(s"MERGE INTO `$viaSql` USING merge_upd ON t.user_id < s.user_id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "conjunction of equality")
    rejects(s"MERGE INTO `$viaSql` USING merge_upd ON t.user_id = s.other_key " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "SAME column")
    rejects(s"MERGE INTO `$viaSql` AS t USING merge_upd AS s ON t.day = s.day " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "at least one real key")
    rejects(s"MERGE INTO `$viaSql` USING merge_upd ON t.user_id = s.user_id " +
      "WHEN MATCHED THEN UPDATE SET value = s.value",
      "unsupported MERGE shape")
    // a qualifier naming neither alias nor the source view is a typo'd
    // table, not a merge key
    rejects(s"MERGE INTO `$viaSql` USING merge_upd ON foo.user_id = bar.user_id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "unknown alias")
    // unaliased source: its own view name is the legal qualifier
    assert(Dml.merge(spark, mkWarehouse(), "merge_upd",
      "merge_upd.user_id = merge_upd.user_id") == ((1L, 1L)))

    // empty incremental batch: MERGE affects 0 rows, never throws
    updates.limit(0).createOrReplaceTempView("merge_empty")
    val before = state(viaSql)
    assert(Dml.execute(spark,
      s"""MERGE INTO `$viaSql` AS t USING merge_empty AS s ON t.user_id = s.user_id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""") == 0)
    assert(state(viaSql) == before)
  }

  test("ad-hoc surface rejects nothing the engine supports: aggregate over view") {
    val out = Views.adhoc(spark, sf,
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 0")
    assert(out.as[Long].head() > 0)
  }

  test("reference diagnostics panel renders: information_schema verbatim + SHOW/DESCRIBE") {
    // the reference's run_diagnostics (dashboard/timescaledb_model.py:600,
    // 638-644) pastes these two Postgres information_schema queries; they
    // run UNCHANGED through the plain ad-hoc surface — registerAll builds
    // the information_schema views alongside the table views, so no
    // explicit setup call appears here on purpose
    val tables = Views.adhoc(spark, sf,
      "SELECT table_name FROM information_schema.tables WHERE table_schema='public'")
      .as[String].collect().toSet
    assert(tables == Tables.all.toSet, s"diagnostics table list wrong: $tables")

    val schema = Views.adhoc(spark, sf,
      """SELECT table_name, column_name, data_type
        |FROM information_schema.columns
        |WHERE table_schema = 'public'
        |ORDER BY table_name, ordinal_position""".stripMargin).collect()
    val evCols = schema.filter(_.getString(0) == "events").map(_.getString(1)).toSeq
    assert(evCols == Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"events columns wrong or unordered: $evCols")
    assert(schema.find(r => r.getString(0) == "events" && r.getString(1) == "ts")
      .get.getString(2) == "timestamp", "canonicalized ts must report as timestamp")

    // Spark's native introspection works through the same adhoc seam
    val shown = Views.adhoc(spark, sf, "SHOW TABLES").select("tableName")
      .as[String].collect().toSet
    assert(Tables.all.toSet.subsetOf(shown), s"SHOW TABLES missing views: $shown")
    val desc = Views.adhoc(spark, sf, "DESCRIBE TABLE documents")
      .select("col_name").as[String].collect().toSeq
    assert(desc.containsSlice(Seq("doc_id", "text", "lang", "source", "n_chars")), desc.toString)

    // and the panel's per-table rowcounts (the stats dict it builds)
    val stats = graft.sql.Diagnostics.tableStats(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(stats.keySet == Tables.all.toSet && stats.values.forall(_ > 0), stats.toString)
  }
}
