package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ingest-time canonicalization expression library (SURVEY.md §2.8/§2.9,
  * reference F1–F9). Everything here is a native `Column` expression chain
  * — no UDFs — so whole-stage codegen keeps the hot path vectorized; the
  * reference's 4M-call memo cache (`etl/etl.py:119`) is subsumed by
  * codegen (SURVEY.md §4).
  */
object Normalize {

  /** Boursorama market prefixes → (market id), in the reference's check
    * order (`etl/etl.py:55-64` MARKET_PREFIXES): first matching prefix
    * wins, default = caller-supplied mid (Paris 6).
    */
  val marketPrefixes: Seq[(String, Int)] = Seq(
    "1rP"   -> 6, // Paris
    "1rA"   -> 5, // Amsterdam
    "1u"    -> 2, // London
    "1g"    -> 3, // Milan
    "FF55-" -> 4, // Madrid
    "1z"    -> 7, // Xetra
    "FF11_" -> 8, // Brussels
    "1b"    -> 8) // Brussels (alternate prefix)

  /** Bare symbol with any market prefix stripped (`etl/etl.py:66-101`). */
  def bareSymbol(symbol: Column): Column =
    marketPrefixes.foldRight(symbol) { case ((p, _), acc) =>
      when(symbol.startsWith(p), symbol.substr(lit(p.length + 1), length(symbol))).otherwise(acc)
    }

  /** Market id derived from the symbol prefix, else `defaultMid`. */
  def marketIdFromSymbol(symbol: Column, defaultMid: Column): Column =
    marketPrefixes.foldRight(defaultMid) { case ((p, mid), acc) =>
      when(symbol.startsWith(p), lit(mid)).otherwise(acc)
    }

  /** `str.removeprefix('SRD')` on company names (`etl/etl.py:187, 526`). */
  def stripSrd(name: Column): Column =
    when(name.startsWith("SRD"), name.substr(lit(4), length(name))).otherwise(name)

  /** pandas `to_numeric(errors='coerce')`: unparseable → null. Spark 4's
    * ANSI mode makes a bare cast THROW on garbage, so guard with a numeric
    * regex instead (pure expression, codegen-friendly, no try_cast needed).
    */
  private val doubleRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  def toDoubleCoerce(c: Column): Column =
    when(c.rlike(doubleRe), c.cast("double"))

  /** Boursorama dirty price → double: drop `"(c)"`-style letter markers and
    * whitespace, decimal comma → dot, unparseable → null
    * (`etl/etl.py:189-193`, errors='coerce').
    */
  def cleanPriceBoursorama(last: Column): Column =
    toDoubleCoerce(regexp_replace(
      regexp_replace(last.cast("string"), "\\([a-zA-Z]\\)|\\s+", ""),
      ",", "."))

  /** Euronext dirty price → double: keep digits/dot/comma only, comma → dot
    * (`etl/etl.py:529`).
    */
  def cleanPriceEuronext(last: Column): Column =
    toDoubleCoerce(regexp_replace(
      regexp_replace(coalesce(last.cast("string"), lit("")), "[^0-9.,]+", ""),
      ",", "."))

  /** Euronext volume → double, non-digits stripped, null → 0
    * (`etl/etl.py:531`).
    */
  def cleanVolumeEuronext(volume: Column): Column =
    coalesce(toDoubleCoerce(regexp_replace(volume.cast("string"), "[^0-9]+", "")), lit(0.0))

  /** Euronext free-text market → id via case-insensitive substring match,
    * default Paris 6 (`etl/etl.py:546-564` — the reference's only per-row
    * Python UDF, rewritten as a codegen'd when-chain).
    */
  val marketNameIds: Seq[(String, Int)] = Seq(
    "paris" -> 6, "amsterdam" -> 5, "london" -> 2, "milan" -> 3,
    "madrid" -> 4, "brussels" -> 8, "xetra" -> 7)

  def marketIdFromText(market: Column): Column =
    marketNameIds.foldRight(lit(6): Column) { case ((name, mid), acc) =>
      when(lower(market).contains(name), lit(mid)).otherwise(acc)
    }

  /** `YYYY-MM-DD` date embedded in a file name (`etl/etl.py:538-542`). */
  // no-match guards on both extractors: regexp_extract yields "" (not
  // null) on a non-matching filename, and concat_ws SKIPS nulls — so an
  // unguarded cast sees "" / " " and THROWS under ANSI instead of
  // nulling (degenerate-gauntlet finding: any filename without the date
  // pattern, or a null filename, crashed the ingest path)
  def fileDate(fileName: Column): Column = {
    val d = regexp_extract(fileName, "(\\d{4}-\\d{2}-\\d{2})", 1)
    when(d =!= "", to_date(d))
  }

  /** Full event timestamp from names like `"alias YYYY-MM-DD HH_MM_SS"`
    * — underscores in the time part become colons (`etl/etl.py:139-159`).
    */
  def fileTimestamp(fileName: Column): Column = {
    val d = regexp_extract(fileName, "(\\d{4}-\\d{2}-\\d{2})", 1)
    val t = regexp_replace(regexp_extract(fileName, "(\\d{2}_\\d{2}_\\d{2})", 1), "_", ":")
    when(d =!= "" && t =!= "", to_timestamp(concat_ws(" ", d, t)))
  }
}
