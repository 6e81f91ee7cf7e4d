package graft

/** Driver-contract sanity: entry() returns rows, every oracle key has a
  * query, catalog names are unique.
  */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("catalog names are unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size == names.distinct.size)
  }

  test("all queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      // the driver sorts columns BY NAME before hashing — a duplicate
      // column name would silently corrupt the compare, not error
      val cols = df.columns.toSeq
      assert(cols.size == cols.distinct.size, s"$name has duplicate column names: $cols")
      val n = df.count()
      assert(n >= 0, s"$name failed")
      // high-threshold filters may legitimately match nothing at sf0.001
      if (!Set("dedup_minhash_lsh", "dedup_jaccard", "anti_join_inactive").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }
}
