package graft.queries

import graft.{QueryDef, Tables}
import graft.ingest.Normalize
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function coverage (SURVEY.md §2.8 F1–F9, §2.9 D1–D5, §2.10
  * M1–M4). The reference's dirty inputs (prefixed symbols, decimal-comma
  * prices with "(c)" markers, free-text market names, filename-embedded
  * timestamps) are synthesized DETERMINISTICALLY from testdata columns, so
  * the oracle can rebuild byte-identical inputs and independently verify
  * the cleanup expressions.
  */
object FunctionQueries {

  // synthetic Boursorama-style symbol: prefix chosen by key mod 9, then
  // 'SYM<key>' (FIXTURES.md §1.1)
  private def syntheticSymbol(key: Column): Column = {
    val prefixes = Seq("1rP", "1rA", "1u", "1g", "FF55-", "1z", "FF11_", "1b", "")
    val prefix = prefixes.zipWithIndex.foldLeft(lit(""): Column) {
      case (acc, (p, i)) => when(key % 9 === i, lit(p)).otherwise(acc)
    }
    concat(prefix, lit("SYM"), key.cast("string"))
  }

  // single line: the enclosing query uses stripMargin, which would eat the
  // leading bar of a line-initial `||`
  private val syntheticSymbolSql =
    "CASE c_custkey % 9 WHEN 0 THEN '1rP' WHEN 1 THEN '1rA' WHEN 2 THEN '1u' " +
      "WHEN 3 THEN '1g' WHEN 4 THEN 'FF55-' WHEN 5 THEN '1z' " +
      "WHEN 6 THEN 'FF11_' WHEN 7 THEN '1b' ELSE '' END || " +
      "'SYM' || CAST(c_custkey AS VARCHAR)"

  val entries: Seq[QueryDef] = Seq(
    // F1/F2: SRD name prefix strip + symbol/market normalization — the
    // reference's hottest function (4M calls, `etl/etl.py:66-101, 119`),
    // here a codegen'd when-chain verified against an independent SQL
    // formulation in DuckDB.
    QueryDef(
      "symbol_normalize",
      Some(s"""
        WITH s AS (
          SELECT c_custkey,
                 $syntheticSymbolSql AS raw_symbol,
                 CASE WHEN c_custkey % 4 = 0 THEN 'SRD' || c_name ELSE c_name END AS raw_name
          FROM customer
        )
        SELECT c_custkey, raw_symbol, raw_name,
               CASE WHEN raw_symbol LIKE '1rP%' THEN substr(raw_symbol, 4)
                    WHEN raw_symbol LIKE '1rA%' THEN substr(raw_symbol, 4)
                    WHEN raw_symbol LIKE '1u%' THEN substr(raw_symbol, 3)
                    WHEN raw_symbol LIKE '1g%' THEN substr(raw_symbol, 3)
                    WHEN raw_symbol LIKE 'FF55-%' THEN substr(raw_symbol, 6)
                    WHEN raw_symbol LIKE '1z%' THEN substr(raw_symbol, 3)
                    WHEN raw_symbol LIKE 'FF11\\_%' ESCAPE '\\' THEN substr(raw_symbol, 6)
                    WHEN raw_symbol LIKE '1b%' THEN substr(raw_symbol, 3)
                    ELSE raw_symbol END AS symbol,
               CAST(CASE WHEN raw_symbol LIKE '1rP%' THEN 6
                    WHEN raw_symbol LIKE '1rA%' THEN 5
                    WHEN raw_symbol LIKE '1u%' THEN 2
                    WHEN raw_symbol LIKE '1g%' THEN 3
                    WHEN raw_symbol LIKE 'FF55-%' THEN 4
                    WHEN raw_symbol LIKE '1z%' THEN 7
                    WHEN raw_symbol LIKE 'FF11\\_%' ESCAPE '\\' THEN 8
                    WHEN raw_symbol LIKE '1b%' THEN 8
                    ELSE 6 END AS BIGINT) AS mid,
               CASE WHEN raw_name LIKE 'SRD%' THEN substr(raw_name, 4) ELSE raw_name END AS name
        FROM s
        ORDER BY c_custkey
      """.stripMargin.trim),
      (spark, dir) => {
        val base = Tables.customer(spark, dir).select(
          col("c_custkey"),
          syntheticSymbol(col("c_custkey")).as("raw_symbol"),
          when(col("c_custkey") % 4 === 0, concat(lit("SRD"), col("c_name")))
            .otherwise(col("c_name")).as("raw_name"))
        base.select(
          col("c_custkey"), col("raw_symbol"), col("raw_name"),
          Normalize.bareSymbol(col("raw_symbol")).as("symbol"),
          Normalize.marketIdFromSymbol(col("raw_symbol"), lit(6)).cast("long").as("mid"),
          Normalize.stripSrd(col("raw_name")).as("name"))
          .orderBy("c_custkey")
      }),

    // F3–F5: dirty price/volume parsing — decimal commas, "(c)" markers,
    // junk characters, to-numeric-with-coerce (`etl/etl.py:189-193, 529-531`).
    QueryDef(
      "price_parse",
      Some("""
        WITH s AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR) AS cents,
                 CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty
          FROM lineitem
        ), d AS (
          SELECT l_orderkey, l_linenumber,
                 substr(cents, 1, length(cents) - 2) || ',' || substr(cents, length(cents) - 1, 2) || ' (c)' AS dirty_price,
                 qty || ' units' AS dirty_volume
          FROM s
        )
        SELECT l_orderkey, l_linenumber, dirty_price, dirty_volume,
               CAST(replace(regexp_replace(dirty_price, '\([a-zA-Z]\)|\s+', '', 'g'), ',', '.') AS DOUBLE) AS price,
               CAST(regexp_replace(dirty_volume, '[^0-9]+', '', 'g') AS DOUBLE) AS volume
        FROM d
        ORDER BY l_orderkey, l_linenumber, price NULLS FIRST, volume NULLS FIRST
      """.stripMargin.trim),
      (spark, dir) => {
        val cents = round(col("l_extendedprice") * 100).cast("long").cast("string")
        val qty = col("l_quantity").cast("long").cast("string")
        // FAT result: sort the narrow source FIRST, project after — the
        // range exchange's sampling job then re-reads only the cheap
        // scan instead of re-running the regex battery, and the shuffle
        // moves 4 narrow columns, not the dirty strings (Tails scaladoc;
        // measured 5.9 s → 2.2 s at sf0.1). Sort includes price/quantity:
        // (l_orderkey, l_linenumber) is NOT unique in the testdata (r11
        // sf1 sweep find — tie order diverged at 10× rows), and
        // l_extendedprice orders identically to the oracle's re-parsed
        // `price` (2-decimal values round-trip through cents exactly).
        // The oracle's parsed price/volume are NULL on parse failure, so
        // its ORDER BY pins NULLS FIRST — matching Spark's ASC default
        // here — rather than resting on DuckDB's NULLS LAST default.
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            concat(
              cents.substr(lit(1), length(cents) - 2), lit(","),
              cents.substr(length(cents) - 1, lit(2)), lit(" (c)")).as("dirty_price"),
            concat(qty, lit(" units")).as("dirty_volume"))
          .withColumn("price", Normalize.cleanPriceBoursorama(col("dirty_price")))
          .withColumn("volume", Normalize.cleanVolumeEuronext(col("dirty_volume")))
          .select("l_orderkey", "l_linenumber", "dirty_price", "dirty_volume",
            "price", "volume")
      }),

    // structured PII redaction — the training-data scrub pass that
    // replaces entities (emails, phone numbers, IBANs) with type tags
    // before text enters a corpus, complementing pii_scrub's digit
    // masking. PII is PLANTED deterministically from customer keys (the
    // price_parse idiom: the fixture has no organic PII, so the dirty
    // input is synthesized identically in both engines) and the regexes
    // stay in the Java/RE2 common subset. Counts come from
    // regexp_count / len(regexp_extract_all) so both engines must agree
    // on match SEMANTICS, not just the replacement. Fat row-level
    // output → sort-before-project (Tails scaladoc)
    QueryDef(
      "pii_redact",
      Some("""
        WITH s AS (
          SELECT c_custkey,
                 'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) ||
                 '@mail.example or call +33 61 ' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') ||
                 ' 11 ' || lpad(CAST((c_custkey * 7) % 100 AS VARCHAR), 2, '0') ||
                 ' account FR76 ' || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') ||
                 ' 3000 1234 thanks' AS raw
          FROM customer
        )
        SELECT c_custkey, raw,
               regexp_replace(regexp_replace(regexp_replace(raw,
                 '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                 '\+33( [0-9]{2}){4}', '<PHONE>', 'g'),
                 'FR[0-9]{2}( [0-9]{4}){3}', '<IBAN>', 'g') AS redacted,
               CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(raw, '\+33( [0-9]{2}){4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(raw, 'FR[0-9]{2}( [0-9]{4}){3}')) AS BIGINT) AS n_ibans
        FROM s
        ORDER BY c_custkey
      """.stripMargin.trim),
      (spark, dir) => {
        val raw = concat(
          lit("contact "), col("c_name"), lit(" at user"), col("c_custkey").cast("string"),
          lit("@mail.example or call +33 61 "),
          lpad(pmod(col("c_custkey"), lit(100)).cast("string"), 2, "0"),
          lit(" 11 "),
          lpad(pmod(col("c_custkey") * 7, lit(100)).cast("string"), 2, "0"),
          lit(" account FR76 "),
          lpad(pmod(col("c_custkey") * 13, lit(10000)).cast("string"), 4, "0"),
          lit(" 3000 1234 thanks"))
        val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
        val phone = "\\+33( [0-9]{2}){4}"
        val iban = "FR[0-9]{2}( [0-9]{4}){3}"
        Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
          .select(col("c_custkey"), raw.as("raw"))
          .select(col("c_custkey"), col("raw"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              email, "<EMAIL>"), phone, "<PHONE>"), iban, "<IBAN>").as("redacted"),
            regexp_count(col("raw"), lit(email)).cast("long").as("n_emails"),
            regexp_count(col("raw"), lit(phone)).cast("long").as("n_phones"),
            regexp_count(col("raw"), lit(iban)).cast("long").as("n_ibans"))
      }),

    // F7: free-text market → id via case-insensitive contains chain —
    // replaces the reference's only per-row Python UDF (`etl/etl.py:546-564`).
    QueryDef(
      "market_map_text",
      Some("""
        WITH s AS (
          SELECT c_custkey,
                 CASE c_custkey % 8
                   WHEN 0 THEN 'Euronext PARIS'
                   WHEN 1 THEN 'Euronext Amsterdam MTF'
                   WHEN 2 THEN 'London Stock Exchange'
                   WHEN 3 THEN 'Borsa Italiana (Milan)'
                   WHEN 4 THEN 'BME - Madrid'
                   WHEN 5 THEN 'Euronext Brussels'
                   WHEN 6 THEN 'Deutsche Boerse XETRA'
                   ELSE 'OTC venue' END AS market_text
          FROM customer
        )
        SELECT c_custkey, market_text,
               CAST(CASE WHEN lower(market_text) LIKE '%paris%' THEN 6
                    WHEN lower(market_text) LIKE '%amsterdam%' THEN 5
                    WHEN lower(market_text) LIKE '%london%' THEN 2
                    WHEN lower(market_text) LIKE '%milan%' THEN 3
                    WHEN lower(market_text) LIKE '%madrid%' THEN 4
                    WHEN lower(market_text) LIKE '%brussels%' THEN 8
                    WHEN lower(market_text) LIKE '%xetra%' THEN 7
                    ELSE 6 END AS BIGINT) AS mid
        FROM s
        ORDER BY c_custkey
      """.stripMargin.trim),
      (spark, dir) => {
        val texts = Seq(
          "Euronext PARIS", "Euronext Amsterdam MTF", "London Stock Exchange",
          "Borsa Italiana (Milan)", "BME - Madrid", "Euronext Brussels",
          "Deutsche Boerse XETRA", "OTC venue")
        val text = texts.zipWithIndex.foldLeft(lit("OTC venue"): Column) {
          case (acc, (t, i)) => when(col("c_custkey") % 8 === i, lit(t)).otherwise(acc)
        }
        Tables.customer(spark, dir)
          .select(col("c_custkey"), text.as("market_text"))
          .withColumn("mid", Normalize.marketIdFromText(col("market_text")).cast("long"))
          .orderBy("c_custkey")
      }),

    // F8/F9 + D1–D4: filename-embedded event time — regex date extraction,
    // underscore-time fix, parts, truncation, arithmetic
    // (`etl/etl.py:139-159, 538-542`).
    QueryDef(
      "filename_dates",
      Some("""
        WITH s AS (
          SELECT o_orderkey,
                 'paris ' || strftime(o_orderdate, '%Y-%m-%d') || ' 09_30_00.bz2' AS fname,
                 o_orderdate
          FROM orders
        )
        SELECT o_orderkey, fname,
               CAST(regexp_extract(fname, '(\d{4}-\d{2}-\d{2})', 1) AS DATE) AS file_date,
               strptime(regexp_extract(fname, '(\d{4}-\d{2}-\d{2})', 1) || ' ' ||
                        replace(regexp_extract(fname, '(\d{2}_\d{2}_\d{2})', 1), '_', ':'),
                        '%Y-%m-%d %H:%M:%S') AS file_ts,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) - 30 AS back_30d
        FROM s
        ORDER BY o_orderkey
      """.stripMargin.trim),
      (spark, dir) => {
        // sort-before-project: the regex extracts run once, after the
        // narrow (o_orderkey, o_orderdate) sort (Tails scaladoc)
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate"))
          .orderBy("o_orderkey")
          .select(
            col("o_orderkey"),
            concat(lit("paris "), date_format(col("o_orderdate"), "yyyy-MM-dd"),
              lit(" 09_30_00.bz2")).as("fname"),
            col("o_orderdate"))
          .select(
            col("o_orderkey"), col("fname"),
            Normalize.fileDate(col("fname")).as("file_date"),
            Normalize.fileTimestamp(col("fname")).as("file_ts"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
            date_sub(to_date(col("o_orderdate")), 30).as("back_30d"))
      }),

    // the same semi-structured column through Spark 4's VARIANT type —
    // parse once into the binary variant encoding, then typed
    // variant_get extraction (the shredded path a lakehouse keeps for
    // schema-on-read columns; at 100 TB parse_json runs once per row at
    // ingest, never per query). The oracle states plain JSON extraction:
    // identical values prove the variant road is a representation
    // change, not a semantic one. Distinct aggregation grain from
    // json_extract_props (k-decile histogram per event_type).
    QueryDef(
      "variant_extract_props",
      Some("""
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decade,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, k_decade
      """.stripMargin.trim),
      (spark, dir) => {
        val k = expr("variant_get(parse_json(props), '$.k', 'long')")
        graft.Tails.orderedSmall(
          Tables.events(spark, dir)
            .select(col("event_type"), k.as("k"))
            .groupBy(col("event_type"), expr("k div 10").as("k_decade"))
            .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum")),
          col("event_type"), col("k_decade"))
      }),

    // semi-structured props column: JSON field extraction + typed cast +
    // aggregation over the extracted value
    QueryDef(
      "json_extract_props",
      Some("""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.stripMargin.trim),
      (spark, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(spark, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(k).as("k_sum"),
            min(k).as("k_min"),
            max(k).as("k_max"))
          .orderBy("event_type")
      }),

    // pivot: event_type categories → columns, one count per (user, type).
    // (Renamed from pivot_event_types: ProfileQueries later added a
    // day-grained pivot under the same name, and Map-keyed catalogs keep
    // only the last duplicate — this entry was silently shadowed out of
    // the correctness run until the rename made both live again.)
    QueryDef(
      "pivot_user_event_types",
      Some("""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """.stripMargin.trim),
      (spark, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(spark, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(coalesce(count(lit(1)), lit(0L)))
          .na.fill(0L, types)
          .orderBy("user_id")
      }),

    // string-function battery over documents: regex extraction, edit
    // distance, padding, substring search, character translation — the
    // text-wrangling toolkit a cleaning pipeline leans on, all
    // codegen'd built-ins (no UDFs)
    QueryDef(
      "string_functions_doc",
      Some("""
        SELECT doc_id,
               regexp_extract(text, '^\S+') AS first_word,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(levenshtein(substr(lower(text), 1, 10), 'the quick ') AS BIGINT) AS lev10,
               lpad(lang, 4, '_') AS lang4,
               CAST(position('the' IN lower(text)) AS BIGINT) AS the_pos,
               translate(lang, 'aeiou', 'AEIOU') AS lang_tr
        FROM documents
        ORDER BY doc_id
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.documents(spark, dir)
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "^\\S+", 0).as("first_word"),
            length(col("text")).cast("long").as("n_chars"),
            levenshtein(substring(lower(col("text")), 1, 10), lit("the quick "))
              .cast("long").as("lev10"),
            lpad(col("lang"), 4, "_").as("lang4"),
            instr(lower(col("text")), "the").cast("long").as("the_pos"),
            translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"))
          .orderBy("doc_id")
      }),

    // ordered string aggregation: sorted distinct concat per group.
    // Spark's collect_set is partition-order-nondeterministic, so the
    // deterministic formulation is sort-then-join — semantically equal
    // to DuckDB's string_agg(DISTINCT ... ORDER BY ...)
    QueryDef(
      "string_agg_segments",
      Some("""
        SELECT n.n_name,
               string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments,
               COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
      """.stripMargin.trim),
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val n = Tables.nation(spark, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
            count(lit(1)).as("n_customers"))
          .orderBy("n_name")
      }),

    // M1–M3: abs, null-safe division, round (`etl/etl.py:388-390`,
    // `dashboard/tabs/tab2.py:117-124`).
    QueryDef(
      "math_functions",
      Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - l_tax) AS abs_diff,
               l_extendedprice / nullif(l_quantity, 0) AS unit_price,
               l_extendedprice / nullif(l_quantity - l_quantity, 0) AS div_by_zero_is_null
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, abs_diff NULLS FIRST, unit_price NULLS FIRST
      """.stripMargin.trim),
      (spark, dir) => {
        // no round(): row-level expressions are the same IEEE ops in both
        // engines → bit-identical; round() would ADD divergence at exact
        // .5 ties (price/quantity often terminates, e.g. x/8 = x.xxxx5)
        val q = col("l_quantity")
        Tables.lineitem(spark, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_discount") - col("l_tax")).as("abs_diff"),
            (col("l_extendedprice") /
              when(q === 0, lit(null)).otherwise(q)).as("unit_price"),
            (col("l_extendedprice") /
              when(q - q === 0, lit(null)).otherwise(q - q)).as("div_by_zero_is_null"))
          // (l_orderkey, l_linenumber) is NOT unique in the driver
          // testdata (143k duplicate pairs at sf0.1) — caught by the r11
          // sf1 spot sweep as an ordered-FAIL/sorted-PASS: the tie order
          // agreed at small SFs only because both engines read one
          // partition stably. Extending the sort with the computed
          // columns makes the output deterministic up to fully-identical
          // rows, which hash equal under any order. Null placement is
          // PINNED on the nullable computed keys (unit_price is NULL at
          // l_quantity=0): Spark defaults ASC NULLS FIRST, DuckDB NULLS
          // LAST — both sides say NULLS FIRST explicitly so ordering
          // never rests on an engine default (r11 ADVICE).
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("abs_diff").asc_nulls_first, col("unit_price").asc_nulls_first)
      }),

    // Morton (Z-order) curve values — the multi-dimensional layout key
    // behind operators/ZOrder's data-skipping write. The interleave is
    // generated from ONE loop for both engines (ZOrder.zValue /
    // ZOrder.zValueDuck), so engine and oracle cannot drift. Histogram
    // by curve value: zval is unique after the groupBy → total order
    QueryDef(
      "zorder_curve",
      Some(s"""
        WITH z AS (
          SELECT ${graft.operators.ZOrder.zValueDuck("l_partkey", "l_suppkey", 11)} AS zval,
                 l_quantity
          FROM lineitem
        )
        SELECT CAST(zval AS BIGINT) AS zval,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        FROM z
        GROUP BY zval
        ORDER BY zval
        LIMIT 300
      """.stripMargin.trim),
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .select(
            graft.operators.ZOrder.zValue(
              col("l_partkey").cast("long"), col("l_suppkey").cast("long"), 11).as("zval"),
            col("l_quantity"))
          .groupBy("zval")
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
          .orderBy("zval")
          .limit(300)
      })
  )
}
