package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ≥sf1 correctness signal for the catalog entries whose DuckDB oracle
  * is infeasible at sf1 (pairwise-naive / unrolled-iterative oracle
  * shapes — the oracle's limit, not the engine's). VERDICT r11 #3.
  *
  * The signal is a PLANTED invariant, not a self-comparison: ScaleData
  * embeds the base corpus VERBATIM as replica 0 of the scaled data
  * (identity key shift, identity letter rotation), with every other
  * replica key-disjoint and letter/dimension-rotated so it cannot
  * interfere with replica-local semantics (cross-replica text
  * distinctness and ts uniqueness are asserted at generation). So for
  * any entry whose per-row / per-pair / per-component output depends
  * only on replica-local data, the engine's sf1 output RESTRICTED to
  * base keys must equal its base (sf0.1) output EXACTLY — the base
  * result is known-correct from the driver's DuckDB gate at sf0.1, and
  * recovering it bit-for-bit from inside 10× data is exact recovery of
  * 20k+ planted ground-truth rows per entry. A cross-replica collision,
  * a candidate-generation miss at 10× density, a partition-count
  * sensitivity, or a nondeterministic tie would all surface as a diff.
  *
  * Entries whose semantics are globally coupled get entry-specific
  * invariants instead (monotone-best for rank joins, cross-plan
  * agreement for the fused interval agg, exact ×factor laws for global
  * rollups) — each stated next to its check.
  *
  * Usage: tools/run_main.sh graft.ScaleInvariants \
  *          <baseDir=/root/testdata/sf0.1> <scaledDir=/tmp/graft_sf1> \
  *          <outJson> [name1,name2,...]
  * Writes {entry: {check, pass, detail}} for the selected entries
  * (default: all registered).
  */
object ScaleInvariants {

  final case class Check(kind: String, run: () => (Boolean, String))

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scaledDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val outJson = if (args.length > 2) Some(args(2)) else None
    val only = if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-invariants")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = runAll(spark, baseDir, scaledDir, only)
    val json = results.toSeq.sortBy(_._1).map { case (n, (kind, pass, detail)) =>
      s""""$n": {"check": "$kind", "pass": $pass, "detail": "${detail.replace("\"", "'")}"}"""
    }.mkString("{\n", ",\n", "\n}")
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        json.getBytes("UTF-8"))
    }
    val bad = results.collect { case (n, (_, false, d)) => s"$n: $d" }
    println(s"[invariants] ${results.size} checked, ${bad.size} failed" +
      (if (bad.nonEmpty) "\n" + bad.mkString("\n") else ""))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }

  def runAll(spark: SparkSession, baseDir: String, scaledDir: String,
             only: Option[Set[String]]): Map[String, (String, Boolean, String)] = {
    val q = SparkEntry.queries
    def base(name: String): DataFrame = q(name)(spark, baseDir)
    def scaled(name: String): DataFrame = q(name)(spark, scaledDir)

    // base keyspace bounds — replica r shifts key k to k + r*(max+1), so
    // "key < max+1" selects exactly replica 0 (= the planted base data)
    def maxOf(t: DataFrame, c: String): Long =
      t.agg(max(col(c).cast("long"))).head().getLong(0) + 1
    val D = maxOf(Tables.documents(spark, baseDir), "doc_id")
    val V = maxOf(Tables.embeddings(spark, baseDir), "vec_id")
    val E = maxOf(Tables.events(spark, baseDir), "event_id")
    val C = maxOf(Tables.customer(spark, baseDir), "c_custkey")
    val S = maxOf(Tables.supplier(spark, baseDir), "s_suppkey")
    val P = maxOf(Tables.part(spark, baseDir), "p_partkey")

    /** Exact recovery of the planted base result: scaled-restricted and
      * base outputs are multiset-equal (exceptAll both ways + counts).
      */
    def restrictedEq(name: String, restrict: org.apache.spark.sql.Column): (Boolean, String) = {
      val r0 = base(name).cache()
      val r1 = scaled(name).filter(restrict).cache()
      try {
        val (n0, n1) = (r0.count(), r1.count())
        val missing = r0.exceptAll(r1).count()
        val extra = r1.exceptAll(r0).count()
        (n0 == n1 && missing == 0 && extra == 0 && n0 > 0,
          s"base=$n0 restricted=$n1 missing=$missing extra=$extra")
      } finally { r0.unpersist(); r1.unpersist() }
    }

    val checks: Map[String, Check] = Map(
      // ---- pair outputs: the pair predicate (exact jaccard / cosine /
      // edit distance / containment) is pair-local and candidate
      // generation is monotone in corpus size, so restricting both
      // endpoints to base keys must recover the base pairs exactly
      "dedup_jaccard" -> Check("restricted_eq",
        () => restrictedEq("dedup_jaccard", col("doc_a") < D && col("doc_b") < D)),
      "dedup_jaccard_prefix" -> Check("restricted_eq",
        () => restrictedEq("dedup_jaccard_prefix", col("doc_a") < D && col("doc_b") < D)),
      "dedup_minhash_lsh" -> Check("restricted_eq",
        () => restrictedEq("dedup_minhash_lsh", col("doc_a") < D && col("doc_b") < D)),
      "dedup_containment" -> Check("restricted_eq",
        () => restrictedEq("dedup_containment", col("doc_a") < D && col("doc_b") < D)),
      "dedup_incremental" -> Check("restricted_eq",
        () => restrictedEq("dedup_incremental", col("doc_new") < D && col("doc_store") < D)),
      "dedup_incremental_sig" -> Check("restricted_eq",
        () => restrictedEq("dedup_incremental_sig", col("doc_new") < D && col("doc_store") < D)),
      "dedup_embedding" -> Check("restricted_eq",
        () => restrictedEq("dedup_embedding", col("vec_a") < V && col("vec_b") < V)),
      // the strict entry UNIONS 200 planted near-dups at vec_id+1e9 —
      // replica-0-verbatim at any factor. The offset was 100000 until
      // the r12 sf10 run caught it colliding with replica-50+ keyspace
      // at factor 100 (V=2000 ⟹ replicas 50–99 span exactly
      // 100000..199999): the restriction admitted 100k foreign vectors
      // and the id collision silently changed cluster sizes. 1e9 clears
      // any realistic replication factor (collision needs factor ≥
      // 1e9/V = 500k). Base keys = (< V) ∪ (≥ 1e9)
      "dedup_embedding_strict" -> Check("restricted_eq",
        () => restrictedEq("dedup_embedding_strict",
          (col("vec_a") < V || col("vec_a") >= 1000000000L) &&
            (col("vec_b") < V || col("vec_b") >= 1000000000L))),
      // new batch = (vec_id < 200) + 1e9 — replica-0-verbatim by
      // construction at any factor, so only the STORE side needs the
      // base-key restriction (vec_new < V would select nothing)
      "dedup_embedding_incremental" -> Check("restricted_eq",
        () => restrictedEq("dedup_embedding_incremental", col("vec_store") < V)),
      "fuzzy_match_names" -> Check("restricted_eq",
        () => restrictedEq("fuzzy_match_names", col("d_key") < S && col("c_key") < S)),
      "fuzzy_join_rule" -> Check("restricted_eq",
        () => restrictedEq("fuzzy_join_rule", col("d_key") < S && col("c_key") < S)),

      // ---- cluster outputs: components could only change via
      // cross-replica edges, which the rotation disjointness forbids;
      // canonical = cluster minimum and replica ids all exceed base ids,
      // so base labels are invariant
      "dedup_clusters" -> Check("restricted_eq",
        () => restrictedEq("dedup_clusters", col("doc_id") < D)),
      "curate_neardup" -> Check("restricted_eq",
        () => restrictedEq("curate_neardup", col("doc_id") < D)),
      // θ=0.4 is weak enough that base↔replica edges exist at 10× density
      // (random 128-dim rotations clear cos 0.4 across 2G pairs), so base
      // labels/sizes legitimately change — but edges are MONOTONE in the
      // corpus, so clusters can only MERGE, never split: the scaled
      // labelling restricted to base keys must be a coarsening of the
      // base labelling (every base cluster maps into ONE scaled cluster)
      "embedding_clusters" -> Check("cluster_refinement", () => {
        val b = base("embedding_clusters")
          .select(col("vec_id"), col("canonical_id").as("c0"))
        val s1 = scaled("embedding_clusters").filter(col("vec_id") < V)
          .select(col("vec_id"), col("canonical_id").as("c1"))
        val j = b.join(s1, Seq("vec_id")).cache()
        try {
          val nB = b.count(); val nJ = j.count()
          // a base cluster split = some c0 group spanning >1 scaled label
          val splits = j.groupBy(col("c0"))
            .agg(countDistinct(col("c1")).as("k"))
            .filter(col("k") > 1).count()
          (nB == nJ && splits == 0 && nB > 0,
            s"base=$nB joined=$nJ split_clusters=$splits")
        } finally { j.unpersist() }
      }),
      // θ=0.9 forbids cross-replica edges in practice; planted batch at
      // vec_id+1e9 is replica-0-verbatim (see dedup_embedding_strict)
      "embedding_clusters_strict" -> Check("restricted_eq",
        () => restrictedEq("embedding_clusters_strict",
          col("vec_id") < V || col("vec_id") >= 1000000000L)),

      // ---- graphs: replica subgraphs are node-disjoint isomorphic
      // copies (all key columns co-shifted), so per-node outputs of the
      // base component are untouched by 9 more components
      "graph_kcore" -> Check("restricted_eq",
        () => restrictedEq("graph_kcore", col("node") < P)),
      "graph_triangles" -> Check("restricted_eq",
        () => restrictedEq("graph_triangles", col("node") < P)),
      "graph_mass_flow" -> Check("restricted_eq",
        () => restrictedEq("graph_mass_flow", col("suppkey") < S)),
      // BFS/SSSP sources sit in the base component; replicas are
      // unreachable, so the UNRESTRICTED result must equal base
      "graph_bfs_hops" -> Check("restricted_eq",
        () => restrictedEq("graph_bfs_hops", lit(true))),
      "graph_sssp" -> Check("restricted_eq",
        () => restrictedEq("graph_sssp", lit(true))),

      // ---- interval joins: pair emission is (event, window)-local;
      // replica events/incidents are excluded by the key restriction
      "interval_join_bucketed" -> Check("restricted_eq",
        () => restrictedEq("interval_join_bucketed",
          col("incident_id") < E && col("event_id") < E)),
      "interval_join_rule" -> Check("restricted_eq",
        () => restrictedEq("interval_join_rule",
          col("incident_id") < E && col("event_id") < E)),
      // fused agg counts ALL replicas' events per window (the
      // densification is the point) — its sf1 signal is cross-PLAN
      // agreement: sum of per-window counts must equal the rows the
      // pair-materializing plan emits on the same data
      "interval_join_agg" -> Check("cross_plan_sum", () => {
        val fused = scaled("interval_join_agg")
          .agg(sum(col("n_events"))).head().getLong(0)
        val pairs = scaled("interval_join_bucketed").count()
        (fused == pairs && fused > 0L, s"sum(n_events)=$fused pair_rows=$pairs")
      }),

      // ---- rank joins: the per-key BEST is monotone in the candidate
      // set. Every base d_key must persist, its jw can only improve, and
      // a tie cannot displace the base winner (replica keys sort larger)
      "jaro_winkler_rank" -> Check("monotone_best", () => {
        val b = base("jaro_winkler_rank")
          .select(col("d_key"), col("c_key").as("c0"), col("jw").as("jw0"))
        val s1 = scaled("jaro_winkler_rank").filter(col("d_key") < S)
        val j = s1.join(b, Seq("d_key"), "full")
        val nB = b.count(); val nS = s1.count()
        val worse = j.filter(col("jw").isNull || col("jw0").isNull ||
          col("jw") < col("jw0") ||
          (col("jw") === col("jw0") && col("c_key") =!= col("c0"))).count()
        (nB == nS && worse == 0 && nB > 0, s"base=$nB restricted=$nS violations=$worse")
      }),
      // semi join: membership is monotone — every base survivor must
      // survive at 10×, and any NEW survivor must have a genuine
      // replica witness (c_key ≥ S), which we cannot cheaply confirm
      // per-row; assert superset + identical payload on the base rows
      "fuzzy_semi_rule" -> Check("monotone_superset", () => {
        val b = base("fuzzy_semi_rule")
        val s1 = scaled("fuzzy_semi_rule").filter(col("d_key") < S)
        val missing = b.exceptAll(s1).count()
        val extra = s1.exceptAll(b).count()
        // extras are d_keys whose only match is a replica name: allowed
        // by semantics, but with key-derived names they should be rare —
        // require none so drift is loud (revisit with evidence if fires)
        (missing == 0 && extra == 0 && b.count() > 0,
          s"missing=$missing extra=$extra")
      }),

      // ---- per-document local ops (the replica set cannot affect a
      // base doc's own row): exact recovery of the full base output
      "dedup_scrub_spans" -> Check("restricted_eq",
        () => restrictedEq("dedup_scrub_spans", col("doc_id") < D)),
      "dedup_simhash" -> Check("restricted_eq",
        () => restrictedEq("dedup_simhash", col("doc_id") < D)),
      "winnow_fingerprints" -> Check("restricted_eq",
        () => restrictedEq("winnow_fingerprints", col("doc_id") < D)),
      "winnow_rolling" -> Check("restricted_eq",
        () => restrictedEq("winnow_rolling", col("doc_id") < D)),
      "sql_adhoc_winnow" -> Check("restricted_eq",
        () => restrictedEq("sql_adhoc_winnow", col("doc_id") < D)),
      "bpe_encode_fixed" -> Check("restricted_eq",
        () => restrictedEq("bpe_encode_fixed", col("doc_id") < D)),
      "multimodal_meta" -> Check("restricted_eq",
        () => restrictedEq("multimodal_meta", col("doc_id") < D)),
      "multimodal_decode" -> Check("restricted_eq",
        () => restrictedEq("multimodal_decode", col("doc_id") < D)),
      "multimodal_features" -> Check("restricted_eq",
        () => restrictedEq("multimodal_features", col("doc_id") < D)),
      "multimodal_frames" -> Check("restricted_eq",
        () => restrictedEq("multimodal_frames", col("doc_id") < D)),
      "multimodal_resize" -> Check("restricted_eq",
        () => restrictedEq("multimodal_resize", col("doc_id") < D)),
      "pii_redact" -> Check("restricted_eq",
        () => restrictedEq("pii_redact", col("c_custkey") < C)),
      "pii_scrub" -> Check("restricted_eq",
        () => restrictedEq("pii_scrub", col("doc_id") < D)),

      // multimodal_rollup is a global agg over media synthesized from
      // doc_id + text. Under the replica key shift (+r·D) the
      // docId-derived planting rules keep media_type (docId%4, D%4==0)
      // and byte length (headers fixed-size per format; letter rotation
      // preserves text byte length) — so n_items and total_bytes obey the
      // exact ×factor law — but corrupt/frames patterns (docId%97,
      // docId%240) do NOT survive the shift, so n_decoded/total_frames
      // legitimately drift per replica. Their per-doc exactness at sf1 is
      // already pinned by the multimodal_{meta,decode,features,frames}
      // restricted_eq passes above; the law here covers the columns the
      // replica construction preserves.
      "multimodal_rollup" -> Check("times_factor_law", () => {
        // replication factor derived from the data itself (10 at sf1,
        // 100 at sf10) — documents replicate exactly ×factor
        val f = lit(Tables.documents(spark, scaledDir).count() /
          Tables.documents(spark, baseDir).count())
        val b = base("multimodal_rollup").select(col("media_type"),
          (col("n_items") * f).as("n_items"),
          (col("total_bytes") * f).as("total_bytes"))
        val s1 = scaled("multimodal_rollup")
          .select("media_type", "n_items", "total_bytes")
        val d = b.exceptAll(s1).count() + s1.exceptAll(b).count()
        (d == 0 && s1.count() > 0, s"rows_diff=$d (n_items/total_bytes law)")
      }),

      // NOT registered: ann_recall_eval and sql_adhoc_similarity. Both
      // are global top-k/recall evaluations whose base results are
      // legitimately displaced by 10× more candidates (measured: the
      // pinned 6-bit-bucket recall collapses to 0.06 at 10× corpus —
      // the lshConfigFor argument, not a correctness bug), so no
      // replica-restriction invariant exists — and both oracles are
      // cheap SQL arithmetic that completes at sf1 (probe: 1 s / 13 s),
      // so they take the STRONGER signal, the DuckDB hash-match sweep.
    )

    val selected = only.map(names => checks.filter(c => names(c._1))).getOrElse(checks)
    selected.map { case (name, c) =>
      val t0 = System.nanoTime()
      val (pass, detail) =
        try c.run()
        catch { case e: Exception => (false, s"ERR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }
      println(f"[invariants] $name: ${if (pass) "PASS" else "FAIL"} ($detail, ${(System.nanoTime() - t0) / 1e9}%.1fs)")
      name -> (c.kind, pass, detail)
    }
  }
}
