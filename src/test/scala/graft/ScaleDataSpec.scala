package graft

import org.apache.spark.sql.functions._

/** ScaleData generates the sf1/sfN testdata the SCALE.md scaling audit
  * measures against — so its replication invariants are load-bearing:
  * if they drift, every per-query scaling ratio in the audit measures
  * the generator, not the engine. Pinned here at factor 100 over
  * sf0.001 — the FULL composed-rotation space (same code path as the
  * audit's factor 10/100 over sf0.1): r=10.. exercises the secondary
  * letter rotation, r=64.. the embedding negation tier, and 100 is the
  * exact mapping-count boundary the require() guards.
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private val factor = 100
  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaledata").toString
    ScaleData.run(spark, sf, dir, factor)
    dir
  }
  private def scaled(name: String) = spark.read.parquet(s"$outDir/$name.parquet")
  private def base(name: String) = Tables.canonical(spark, sf, name)

  test("every fact table replicates exactly factor x with unique keys; dims stay fixed") {
    for ((t, key) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id",
      "part" -> "p_partkey", "supplier" -> "s_suppkey")) {
      val n = base(t).count()
      val s = scaled(t).agg(count(lit(1)), countDistinct(col(key))).head()
      assert(s.getLong(0) == factor * n, s"$t rows: ${s.getLong(0)} != $factor*$n")
      assert(s.getLong(1) == factor * n, s"$t keys not unique after offsetting")
    }
    assert(scaled("lineitem").count() == factor * base("lineitem").count())
    for (t <- Seq("region", "nation"))
      assert(scaled(t).count() == base(t).count(), s"fixed dim $t must not grow")
  }

  test("FK offsets move together: no orphans, and event timestamps stay globally unique") {
    def orphans(fact: String, fk: String, dim: String, pk: String): Long =
      scaled(fact).join(scaled(dim), col(fk) === col(pk), "left_anti").count()
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("events", "user_id", "customer", "c_custkey") == 0,
      "events.user_id must keep joining c_custkey (broadcast_enrich contract)")
    val ev = scaled("events")
    assert(ev.agg(countDistinct(col("ts"))).head().getLong(0) == ev.count(),
      "the +r microsecond shift must preserve the min_by/max_by uniqueness contract")
  }

  test("dup RATE stays constant: replicas do not shingle-match or exact-match each other") {
    // exact text dups must scale linearly (within-replica structure
    // preserved), never quadratically (replicas matching each other)
    val bDup = { val d = base("documents"); d.count() - d.select("text").distinct().count() }
    val sDup = { val d = scaled("documents"); d.count() - d.select("text").distinct().count() }
    assert(sDup == factor * bDup,
      s"exact-dup count must be x$factor (got $sDup vs base $bDup) — letter rotation broken?")
    // embeddings: the rotation x negation transforms keep ALL replicas
    // apart — exact-dup vector count scales linearly like the text (any
    // cross-replica collision would break the == factor·base identity)
    val bEDup = { val d = base("embeddings"); d.count() - d.select("embedding").distinct().count() }
    val sEDup = { val d = scaled("embeddings"); d.count() - d.select("embedding").distinct().count() }
    assert(sEDup == factor * bEDup,
      s"embedding exact-dup count must be x$factor (got $sEDup vs base $bEDup) — " +
        "rotation/negation transform space broken?")
  }

  test("categorical columns and text lengths are preserved (selectivity must not scale)") {
    for ((t, c) <- Seq("events" -> "event_type", "customer" -> "c_mktsegment",
      "part" -> "p_type", "documents" -> "lang", "documents" -> "source")) {
      val b = base(t).select(c).distinct().as[String].collect().toSet
      val s = scaled(t).select(c).distinct().as[String].collect().toSet
      assert(s == b, s"$t.$c domain changed: $s vs $b")
    }
    // translate is 1:1 — n_chars stays consistent with the rotated text
    val bad = scaled("documents").filter(length(col("text")) =!= col("n_chars")).count()
    val badBase = base("documents").filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == factor * badBase, "letter rotation changed text lengths")
  }

  test("facts-only mode: any factor, per-key ts uniqueness, no content tables") {
    // 150 deliberately exceeds BOTH content-design caps run() enforces
    // (100 text mappings, 128 embedding transforms) AND the base feed's
    // min ts gap — the regime the mode exists for
    val f = 150
    val dir = java.nio.file.Files.createTempDirectory("graft-scalefacts").toString
    ScaleData.runFacts(spark, sf, dir, f)
    def fs(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    for ((t, key) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "part" -> "p_partkey", "supplier" -> "s_suppkey")) {
      val n = base(t).count()
      val s = fs(t).agg(count(lit(1)), countDistinct(col(key))).head()
      assert(s.getLong(0) == f * n, s"$t rows: ${s.getLong(0)} != $f*$n")
      assert(s.getLong(1) == f * n, s"$t keys not unique after offsetting")
    }
    assert(fs("lineitem").count() == f * base("lineitem").count())
    // FK co-shift holds (the same contract the full mode pins)
    assert(fs("orders").join(fs("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    // replica 0 is the base feed VERBATIM — what restricted_eq stands on
    val ev = fs("events")
    val baseEv = base("events")
    assert(ev.join(baseEv, Seq("event_id")).count() == baseEv.count())
    // per-KEY ts uniqueness (the facts-only contract; global uniqueness
    // is impossible past `gap` replicas and deliberately not claimed)
    val Array(total, dk) = ev
      .agg(count(lit(1)).cast("long"),
        countDistinct(col("user_id"), col("ts")).cast("long"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(total == dk, s"(user_id, ts) collided: $dk distinct of $total")
    // content tables intentionally absent — a base-verbatim copy would
    // make content-family restricted_eq pass trivially
    for (t <- Seq("documents", "embeddings"))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/$t.parquet")),
        s"facts-only wrote $t")
  }
}
