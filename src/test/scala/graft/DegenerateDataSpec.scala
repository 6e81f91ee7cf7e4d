package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The degenerate-data gauntlet: every catalog query runs against a tiny
  * table set built to hit the divisions, variances, and emptiness real
  * crawl/market data produces and the synthetic testdata never does —
  * empty and whitespace-only documents, zero-valued and constant and
  * duplicate-timestamp event series, zero embeddings, zero-quantity
  * lineitems, zero-price orders.
  *
  * The assertion is NO EXCEPTION (results may be empty or carry nulls).
  * This matters specifically under Spark 4's default ANSI mode, where a
  * division whose denominator can be zero THROWS instead of nulling —
  * while DuckDB (the oracle semantics) quietly returns NULL. The
  * corr()-in-acf_lags crash was the first instance of the class; this
  * gauntlet exists so the rest were found by a test, not by a 100 TB
  * production run. Guards added for it: quality ratios on token-less
  * docs, gini on zero total, TWAP on zero-weight groups, z-score on
  * degenerate variants, pct-change over zero prices, binning on a
  * zero-width domain, z-scores at zero stddev.
  */
class DegenerateDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val degDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    def write(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    def base(name: String, n: Int = 200): DataFrame =
      Tables.load(spark, sf, name).limit(n)

    Seq("region", "nation", "customer", "supplier", "part").foreach(t => write(t, base(t)))
    write("orders", base("orders").unionByName(
      base("orders", 3).withColumn("o_totalprice", lit(0.0))))
    write("lineitem", base("lineitem").unionByName(
      base("lineitem", 3)
        .withColumn("l_quantity", lit(0.0))
        .withColumn("l_extendedprice", lit(0.0))))

    // events: keep 300 real rows, then plant four adversarial users
    val ev = base("events", 300)
    def mk(rows: Seq[(Long, String, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .select(col("event_id"),
          to_timestamp(col("ts_s")).cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    val planted = mk(
      // 9001: constant value (zero variance — corr/stddev territory)
      (0 until 10).map(i => (900100L + i, f"2024-03-01 10:${i}%02d:00", 9001L, "view", 5.0, """{"k": 1}""")) ++
      // 9002: all-zero values (zero sums — gini/vwap/pct-change territory)
      (0 until 10).map(i => (900200L + i, f"2024-03-02 10:${i}%02d:00", 9002L, "purchase", 0.0, """{"k": 0}""")) ++
      // 9003: duplicate timestamps (zero TWAP weights, max_by ties)
      (0 until 6).map(i => (900300L + i, "2024-03-03 10:00:00", 9003L, "click", 3.0, """{"k": 2}""")) ++
      // 9004: a single event (empty window frames, n=1 moments)
      Seq((900400L, "2024-03-04 10:00:00", 9004L, "signup", 9.0, """{"k": 3}"""))
    )
    write("events", ev.unionByName(planted.select(ev.columns.map(col).toIndexedSeq: _*)))

    // documents: real docs plus the empty/whitespace/punct/one-char set
    val docs = base("documents", 100)
    val plantedDocs = Seq(
      (9001L, "", "en", "web", 0L),
      (9002L, "    ", "en", "web", 4L),
      (9003L, "!!! ??? ...", "fr", "web", 11L),
      (9004L, "x", "de", "book", 1L),
      (9005L, "the the the the the the the the", "en", "web", 31L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    write("documents", docs.unionByName(plantedDocs.select(docs.columns.map(col).toIndexedSeq: _*)))

    // embeddings: real vectors plus a zero vector and a duplicate pair
    val emb = base("embeddings", 100)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val zero = Seq((90001L, Array.fill(dim)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    write("embeddings", emb.unionByName(zero.select(emb.columns.map(col).toIndexedSeq: _*)))
    dir
  }

  test("every catalog query survives degenerate inputs (no ANSI throws, no crashes)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, degDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on degenerate data:\n${failures.mkString("\n")}")
  }

  private lazy val emptyDir: String = {
    // the other extreme: schema-correct, zero-row tables — a brand-new
    // deployment, or a day partition that simply has no data yet
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.all.foreach { t =>
      Tables.load(spark, sf, t).limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every catalog query survives fully EMPTY tables (empty results, not crashes)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty tables:\n${failures.mkString("\n")}")
  }

  private lazy val nullsDir: String = {
    // third extreme: NULLs in every non-key column — text, lang, value,
    // event_type, props, embedding, prices, quantities. Real feeds
    // deliver these (the reference's own dirty CSVs do); every operator
    // must flow them through as SQL nulls, not crash on them.
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    def write(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    def base(name: String, n: Int = 200): DataFrame =
      Tables.load(spark, sf, name).limit(n)
    def nullOut(df: DataFrame, keep: Set[String]): DataFrame =
      df.columns.foldLeft(df) { (acc, c) =>
        if (keep(c)) acc
        else acc.withColumn(c, when(lit(false), col(c))) // typed NULL
      }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      val b = base(t)
      val keyCol = b.columns.head
      write(t, b.unionByName(nullOut(b.limit(2), Set(keyCol))))
    }
    val ord = base("orders")
    write("orders", ord.unionByName(nullOut(ord.limit(3), Set("o_orderkey"))))
    val li = base("lineitem")
    write("lineitem", li.unionByName(nullOut(li.limit(3), Set("l_orderkey", "l_linenumber"))))
    val ev = base("events", 300)
    // keep ts too: a null event time is dropped at ingest by contract,
    // but null value/type/props must flow through
    write("events", ev.unionByName(nullOut(ev.limit(5), Set("event_id", "ts", "user_id"))))
    val docs = base("documents", 100)
    write("documents", docs.unionByName(nullOut(docs.limit(3), Set("doc_id"))))
    val emb = base("embeddings", 100)
    write("embeddings", emb.unionByName(nullOut(emb.limit(2), Set("vec_id"))))
    dir
  }

  test("every catalog query survives NULL-laden rows (nulls flow, nothing crashes)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, nullsDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on null-laden rows:\n${failures.mkString("\n")}")
  }

  test("ab_test_zscore nulls z on a degenerate pooled rate (0 or 1), no ANSI divide") {
    // every user all-'view' => converted=0 for all => pooled p = 0 and the
    // z variance is 0: the oracle CASE returns NULL, and so must the
    // engine (an unguarded / is a Spark 4 ANSI DIVIDE_BY_ZERO). The
    // gauntlet's planted mix never drives the POOL itself degenerate, so
    // this is pinned directly.
    val dir = java.nio.file.Files.createTempDirectory("graft-abdeg").toString
    val ev = (0 until 40).map { i =>
      (i.toLong, f"2024-03-01 10:${i % 60}%02d:00", (i % 8).toLong, "view", 1.0, "{}")
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("ts_s")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = SparkEntry.queries("ab_test_zscore")(spark, dir).collect()
    assert(row.length == 1)
    val z = row(0).getAs[Any]("z")
    assert(z == null, s"z must be NULL when the pooled conversion rate is 0, got $z")
  }
}
