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

  /** Entries with NO registered invariant, each with its feasibility
    * reason (verdict r12 #4: exclusions must be argued, not silent).
    * Every one of these has the STRONGER sf1 signal — the DuckDB
    * hash-match sweep — because its oracle is cheap at sf1; what they
    * lack is a semantics-preserving restriction under replication.
    */
  val excludedReasons: Map[String, String] = Map(
    // global top-k / ranking: 10× more candidates legitimately displace
    // or interleave with the base winners (ties duplicated across
    // replicas; ranks are corpus-positional)
    "ann_cosine_topk" -> "global top-k; rotated replicas can crack the base top-10 (cos noise ~N(0,1/sqrt(d)))",
    "ann_ivf_topk" -> "global top-k over 10x candidates (see ann_cosine_topk)",
    "ann_ivf_external" -> "global top-k over 10x candidates",
    "ann_lsh_topk" -> "global top-k over 10x candidates; bucket occupancy changes",
    "ann_pq_adc_topk" -> "global top-k over 10x candidates",
    "ann_pq_codes" -> "PQ codebook trained on the corpus; replica rotation changes centroids",
    "ann_topk_bounded" -> "global top-k over 10x candidates",
    "ann_recall_eval" -> "recall of a pinned config legitimately collapses at 10x corpus (lshConfigFor argument)",
    "sql_adhoc_similarity" -> "global top-k over 10x candidates",
    "time_range_topk" -> "top-k by time over a 10x-densified feed re-ranks by construction",
    "top_unshipped_q3" -> "global top-10 with replica-duplicated revenues",
    "big_order_customers_q18" -> "global top-10 by quantity with replica-duplicated dq ties",
    "top_quality_docs" -> "per-lang top-k; rotated replica quality scores compete",
    "cap_per_source" -> "per-source hash top-5; replica hashes compete within unchanged sources",
    "class_balance" -> "cap = min class size scales x f and replica hashes re-rank within classes",
    "global_percent_rank" -> "percent_rank is corpus-positional by definition",
    "rfm_segmentation" -> "global ntile quartiles over a replica-interleaved distribution",
    "group_max_next_id" -> "dense-id from global max key: scaled max = base max + (f-1)*keyspace",
    "company_registration" -> "dense-id assignment is corpus-positional by definition",
    "weighted_sample" -> "fixed-size weighted sample over 10x competitors selects differently",
    "token_budget_sample" -> "fixed global token budget over a 10x corpus fills from different docs",
    "basket_lift" -> "top-20 by lift where lift scales x f uniformly - replicas tie the ranking",
    // corpus-global text statistics: the letter rotation guarantees
    // SHINGLE distinctness, but single TOKENS can collide across
    // rotations ('eat'->'tao' could equal another corpus token), so
    // token/ngram df-based outputs are not replica-separable
    "ngram_top" -> "corpus bigram counts; rotated tokens can collide with base tokens",
    "collocation_pmi" -> "corpus PMI over rotated tokens (see ngram_top)",
    "heavy_hitter_tokens" -> "corpus token counts (see ngram_top)",
    "bpe_merges" -> "merge list trained on the rotated corpus changes by construction",
    "bpe_pair_counts" -> "corpus pair counts change under rotation",
    "bpe_encode" -> "encodes with corpus-trained merges (bpe_encode_fixed covers the frozen path)",
    "tokenizer_fertility" -> "single_token_frac tests membership in a corpus-trained vocab",
    "bigram_lm_perplexity" -> "LM probabilities are corpus-trained; rotation perturbs them",
    "perplexity_filter" -> "unigram LM corpus-trained (see bigram_lm_perplexity)",
    // replication-sensitive statistics by formula
    "ab_test_zscore" -> "z scales with sqrt(n) by definition",
    "gini_concentration" -> "finite-population terms make gini scale-dependent by formula",
    "k_anonymity" -> "size buckets of group sizes shift when group sizes scale x f",
    "skew_diagnostics" -> "share = cnt/total scales 1/f while per-user cnt is constant",
    "corr_stats" -> "covar_samp/var_samp n-1 corrections are not replication-invariant",
    "value_quantiles" -> "exact-percentile interpolation is not replication-invariant at tie boundaries",
    "time_to_convert" -> "percentile interpolation over a duplicated population (see value_quantiles)",
    "winsorize_stats" -> "p05/p95 bounds interpolate over the duplicated distribution",
    "unpivot_quartiles" -> "global ntile per metric over replica-interleaved values",
    "seasonal_decompose" -> "every column scales linearly with feed density but through different division roundings (sub-ulp)",
    // embedding dimension mixing
    "embedding_dim_stats" -> "replica embeddings are dimension-rotated: per-dim stats mix dims by construction",
    "embedding_quantize_int8" -> "per-dim stats under dimension rotation (see embedding_dim_stats)",
    "label_centroids" -> "per-(label,dim) means under dimension rotation",
    // construction-specific
    "table_checksum" -> "whole-table checksum is corpus-global by definition",
    "partition_checksums" -> "per-month checksums absorb replica rows (months are replica-invariant)",
    "snapshot_diff" -> "synthetic churn's +1e7 insert keyspace collides with replica>=17 keys at factor 100",
    "sql_adhoc_recursive" -> "key-arithmetic parent chains are not shift-equivariant at replica boundaries",
    "null_safe_join" -> "sector = user_id % 7 / % 10: the replica key shift remaps sectors, so per-sector counts do not scale uniformly",
    "zorder_curve" -> "the 11-bit interleave masks keys mod 2048, so shifted replica keys alias into base z-buckets non-uniformly",
    "sql_adhoc_unpivot" -> "metric rows mix replication-invariant extremes with a rounded float avg whose scaled value rounds through a different float sum")

  /** Checks runnable on a FACTS-ONLY corpus (`ScaleData --facts-only`:
    * documents/embeddings not written; events.ts shifted mod the base
    * feed's min gap, so only per-KEY ts uniqueness holds — which is all
    * the per-user window/group entries require). Every name here reads
    * fact tables only and its invariant survives any replication factor;
    * the registered checks NOT in this set get a reasoned exclusion in
    * the emitted JSON ([[factsOnlyExcludedReasons]] or the blanket
    * content-family reason).
    */
  val factsOnlySafe: Set[String] = Set(
    // events / user_id keyspace (per-user windows & groups)
    "acf_lags", "bollinger", "drawdown", "ewma_smooth", "first_last_day",
    "funnel_stages", "gapfill_daily", "golden_record", "interpolate_linear",
    "lag_pct_change", "mad_stats", "mode_event_type", "nav_functions",
    "pivot_user_event_types", "rank_functions", "row_stats",
    "salted_agg_events", "scd2_intervals", "sessionization",
    "skew_join_salted", "sql_adhoc_window", "tick_compression",
    "tick_compression_scaled", "trailing_window_1h", "trend_slope",
    "twap_daily", "union_distinct", "vwap_daily", "zscore_anomaly",
    "weekly_candles", "company_chart_data", "ohlcv_daily", "ohlcv_typed",
    "candles_incremental", "etl_pipeline",
    // customer / orders / lineitem keyspaces
    "anti_join_inactive", "semi_join_active", "prefix_search",
    "market_map_text", "symbol_normalize", "sql_adhoc_exists",
    "sql_adhoc_lateral", "set_operations", "dedup_keep_first",
    "scd_last_writer", "filename_dates", "point_lookup", "math_functions",
    "price_parse", "limit_offset_page", "pii_redact",
    // event keyspace (per-event / per-user join semantics)
    "asof_join_enrich", "broadcast_enrich", "click_attribution",
    "range_cleanup", "stratified_sample",
    // graphs (replica subgraphs are node-disjoint isomorphic copies)
    "graph_kcore", "graph_triangles", "graph_mass_flow", "graph_bfs_hops",
    "graph_sssp",
    // planted-skew law (events-only variant corpus by construction)
    "skew_planted_hot",
    // exact ×factor rollup laws over fact tables
    "activity_heatmap", "benford_digits", "cohort_retention", "cube_orders",
    "data_profile", "dau_wau_stickiness", "event_paths_top",
    "event_transitions", "expectations_report", "feature_binning",
    "hopping_candles", "ivm_join_agg", "join_agg_revenue",
    "json_extract_props", "month_histogram", "pricing_summary_q1",
    "pivot_event_types", "resample_daily", "rollup_orders", "sql_adhoc_agg",
    "sql_adhoc_grouping_sets", "sql_adhoc_join", "sql_adhoc_pivot",
    "star_join_q5", "string_agg_segments", "table_stats",
    "table_stats_approx", "union_schema_drift", "variant_extract_props")

  /** The REPRESENTATIVE tranche actually run at factor 1000 (the
    * `--facts-rep` flag): one entry per plan-shape family of
    * [[factsOnlySafe]]. Full-scan cost at factor 1000 is ~1.5–9 min per
    * check — the fan-out writer row-interleaves replicas, so parquet
    * row-group stats span every keyspace and the replica-0 restriction
    * cannot prune row groups; running all 91 fact-family checks is a
    * multi-hour step for no additional plan-shape coverage. The family
    * representative exercises the same physical shape and the same
    * invariant algebra; the FULL set runs at factor 100 every round
    * (tools/scale_invariants_sf10_r*.json). Names not selected get a
    * `deferred:` exclusion naming their representative.
    */
  val factsOnlyRepresentative: Set[String] = Set(
    // per-user windows/groups over events (restricted_eq)
    "bollinger", "sessionization", "tick_compression", "first_last_day",
    "ohlcv_daily", "mad_stats", "etl_pipeline",
    // customer/orders/lineitem keyspaces (restricted_eq)
    "anti_join_inactive", "semi_join_active", "point_lookup", "price_parse",
    "dedup_keep_first", "limit_offset_page",
    // event keyspace joins
    "broadcast_enrich", "asof_join_enrich", "click_attribution",
    // exact ×factor rollup laws
    "join_agg_revenue", "star_join_q5", "pricing_summary_q1", "table_stats",
    "month_histogram", "hopping_candles", "dau_wau_stickiness",
    "event_transitions",
    // graphs + planted skew (the heavy tranche)
    "graph_kcore", "graph_triangles", "graph_mass_flow", "graph_bfs_hops",
    "graph_sssp", "skew_planted_hot")

  /** Registered checks EXCLUDED from a facts-only run for a reason other
    * than "its tables are not written": these are cost walls that scale
    * ×f² by construction, so a factor-1000 probe would measure the
    * generator's densification, not the engine.
    */
  val factsOnlyExcludedReasons: Map[String, String] = Map(
    "interval_join_bucketed" -> ("pair stream scales x f^2: replicas share the base wall-clock span " +
      "(ts shift < 1 gap), measured 4.29B pairs at factor 100 -> ~430B at 1000; hours-long by construction"),
    "interval_join_rule" -> "pair stream scales x f^2 (see interval_join_bucketed)",
    "interval_join_agg" -> "aggregates the same x f^2 match stream (no pair materialization, same probe cost)",
    "fuzzy_match_names" -> ("supplier names replicate VERBATIM (facts-only shifts keys only), so every base " +
      "match pair gains f^2 replica combinations: ~10^6 x output at factor 1000 measures the generator"),
    "fuzzy_join_rule" -> "verbatim replica names -> f^2 pair stream (see fuzzy_match_names)",
    "fuzzy_semi_rule" -> "verbatim replica names -> f^2 candidate stream (see fuzzy_match_names)",
    "jaro_winkler_rank" -> "verbatim replica names -> f^2 candidate stream (see fuzzy_match_names)")

  def main(args: Array[String]): Unit = {
    val factsRep = args.contains("--facts-rep")
    val factsOnly = factsRep || args.contains("--facts-only")
    val pos = args.filterNot(_.startsWith("--"))
    val baseDir = if (pos.nonEmpty) pos(0) else "/root/testdata/sf0.1"
    val scaledDir = if (pos.length > 1) pos(1) else "/tmp/graft_sf1"
    val outJson = if (pos.length > 2) Some(pos(2)) else None
    val explicit = if (pos.length > 3) Some(pos(3).split(",").toSet) else None
    val factsSet = if (factsRep) factsOnlyRepresentative else factsOnlySafe
    val only =
      if (!factsOnly) explicit
      else Some(explicit.map(_.intersect(factsSet)).getOrElse(factsSet))
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
    // full JSON string escaping: the ERR path embeds e.getMessage, which
    // can carry backslashes/newlines — quote-only replacement produced a
    // file the ledger combiner could not parse
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }
    val body = results.toSeq.sortBy(_._1).map { case (n, (kind, pass, detail)) =>
      s""""$n": {"check": "$kind", "pass": $pass, "detail": "${esc(detail)}"}"""
    }.mkString(",\n")
    // facts-only: every registered check NOT run gets its reason into the
    // exclusion block — the cost-wall reasons by name, the rest by the
    // blanket content-family reason (their tables do not exist)
    val factsExcl: Map[String, String] =
      if (!factsOnly) Map.empty
      else {
        val all = buildChecks(spark, baseDir, scaledDir).keySet
        val notSafe = (all -- factsOnlySafe)
          .map(n => n -> factsOnlyExcludedReasons.getOrElse(n,
            "content tables (documents/embeddings) not written by ScaleData --facts-only, by design"))
        val deferred =
          if (!factsRep) Set.empty[(String, String)]
          else (factsOnlySafe -- factsOnlyRepresentative).map { n =>
            n -> ("deferred: same-family representative runs at factor 1000 " +
              "(factsOnlyRepresentative scaladoc); the full fact-family set " +
              "runs at factor 100 every round")
          }
        (notSafe ++ deferred).toMap
      }
    val excl = (excludedReasons ++ factsExcl).toSeq.sortBy(_._1).map { case (n, why) =>
      s""""$n": "${esc(why)}""""
    }.mkString(",\n")
    // body can be empty (an --only filter matching no check) — joining
    // unconditionally would emit a leading comma and an unparseable file
    val exclBlock = s""""_excluded": {\n$excl\n}""" +
      (if (factsOnly) ",\n\"_mode\": \"facts_only\"" else "")
    val json = "{\n" + Seq(body, exclBlock).filter(_.nonEmpty).mkString(",\n") + "\n}"
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
    val checks = buildChecks(spark, baseDir, scaledDir)
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

  def buildChecks(spark: SparkSession, baseDir: String, scaledDir: String): Map[String, Check] = {
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
    val O = maxOf(Tables.orders(spark, baseDir), "o_orderkey")
    val S = maxOf(Tables.supplier(spark, baseDir), "s_suppkey")
    val P = maxOf(Tables.part(spark, baseDir), "p_partkey")

    /** Exact recovery of the planted base result: scaled-restricted and
      * base outputs are multiset-equal (exceptAll both ways + counts).
      */
    def restrictedEq(name: String, restrict: org.apache.spark.sql.Column): (Boolean, String) = {
      // localCheckpoint (not cache): severing the lineage to a LogicalRDD
      // makes the exceptAll below safe for plans carrying correlated
      // scalar subqueries — combining two such analyzed plans trips
      // Spark's subquery attribute rebinding (sql_adhoc_exists:
      // NoSuchElementException key not found o_custkey#...), and both
      // sides are base-output-sized so the materialization is what the
      // old cache() paid anyway
      val r0 = base(name).localCheckpoint(true)
      val r1 = scaled(name).filter(restrict).localCheckpoint(true)
      val (n0, n1) = (r0.count(), r1.count())
      val missing = r0.exceptAll(r1).count()
      val extra = r1.exceptAll(r0).count()
      (n0 == n1 && missing == 0 && extra == 0 && n0 > 0,
        s"base=$n0 restricted=$n1 missing=$missing extra=$extra")
    }
    def req(name: String, restrict: org.apache.spark.sql.Column): (String, Check) =
      name -> Check("restricted_eq", () => restrictedEq(name, restrict))

    // replication factor derived from the data itself (10 at sf1, 100 at
    // sf10, 1000 on a facts-only corpus) — events replicate exactly
    // ×factor in BOTH generator modes (documents don't exist in the
    // facts-only variant, so the fact-side laws must not depend on them)
    lazy val factor: Long = Tables.events(spark, scaledDir).count() /
      Tables.events(spark, baseDir).count()

    /** Exact ×factor law for rollups grouped by replica-INVARIANT
      * attributes (days, event types, statuses, nations — unchanged per
      * replica, so every replica contributes an isomorphic copy to each
      * group): additive columns (`times`) must scale by exactly `factor`;
      * ratio / extremum / constant columns (`eq`) must be bit-equal —
      * a ratio of two exactly-×f integers divides to the identical
      * correctly-rounded double. Columns in `drop` are excluded with the
      * reason stated at the registration site (they scale non-linearly
      * or through intermediate roundings).
      */
    def factorLaw(name: String, times: Seq[String], eqCols: Seq[String],
                  drop: Seq[String] = Nil): (String, Check) =
      name -> Check("times_factor_law", () => {
        val outCols = eqCols ++ times
        val b = base(name)
          .select(eqCols.map(col) ++ times.map(c => (col(c) * factor).as(c)): _*)
          .cache()
        val s1 = scaled(name).select(outCols.map(col): _*).cache()
        try {
          val n = b.count()
          val missing = b.exceptAll(s1).count()
          val extra = s1.exceptAll(b).count()
          (missing == 0 && extra == 0 && n > 0,
            s"rows=$n missing=$missing extra=$extra factor=$factor" +
              (if (drop.nonEmpty) s" dropped=${drop.mkString(",")}" else ""))
        } finally { b.unpersist(); s1.unpersist() }
      })

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
      // sized banding CHANGES with corpus size, so restricted_eq is only
      // deterministic because every qualifying pair (θ=0.995) is an exact
      // duplicate — certain recall at any banding. Planted exact dups sit
      // at doc_id+1e9 (replica-0-verbatim, clears any realistic factor)
      "dedup_minhash_sized" -> Check("restricted_eq",
        () => restrictedEq("dedup_minhash_sized",
          (col("doc_a") < D || col("doc_a") >= 1000000000L) &&
            (col("doc_b") < D || col("doc_b") >= 1000000000L))),
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
      // ---- planted-skew law (r14): ScaleData replicas are UNIFORM — no
      // key ever dominates — so the skew machinery's at-scale behavior
      // was pinned only by ScaleOpsSpec's small synthetic. This check
      // plants the hot key into the scaled corpus itself: k=20 verbatim
      // copies of the whole base event feed under one reserved user
      // (10⁹+7, clear of every replica keyspace; event_ids offset by
      // 10¹²+i·E so they stay globally distinct and the deterministic
      // salt spreads them), written as an events-only variant dir that
      // the two skew entries read like any other corpus. Asserted:
      //  1. NON-hot output on the skewed corpus is multiset-identical
      //     to the unskewed run — the hot key perturbs nothing else;
      //  2. the hot row matches exact integer expectations computed
      //     independently from the base feed (n = k·rows,
      //     total = k·centsSum; n_above = k·|{v > mu}| with mu
      //     replicated bit-exactly in driver code — possible because
      //     r14 made mu an exact fixed-point mean);
      //  3. an UNSALTED shuffle join over the same skewed corpus gets
      //     AQE's skew-split treatment (isSkewJoin) — ScaleOpsSpec's
      //     synthetic assert re-proven on corpus-shaped data at scale.
      "skew_planted_hot" -> Check("planted_hot_key", () => {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.joins.SortMergeJoinExec
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val hot = 1000000007L
        val k = 20
        val baseEv = Tables.events(spark, baseDir)
        val planted = (0 until k).map { i =>
          baseEv.withColumn("user_id", lit(hot))
            .withColumn("event_id", col("event_id") + lit(1000000000000L + i.toLong * E))
        }.reduce(_ unionByName _)
        val skewDir = scaledDir.stripSuffix("/") + "_skewvariant"
        Tables.events(spark, scaledDir).unionByName(planted)
          .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
        // exact integer expectations from the base feed
        val head = baseEv.agg(
          count(lit(1)).cast("long"),
          sum(round(col("value") * 100).cast("long")),
          count(col("value")).cast("long")).head()
        val (rows1, s1, n1) = (head.getLong(0), head.getLong(1), head.getLong(2))
        // mu exactly as the entry computes it over the k-copy feed:
        // (k·S) and (k·n) are < 2^53, so the doubles below are the very
        // operands Spark's codegen divides, and setScale(6, HALF_UP) is
        // Spark round()'s own definition
        val mu = BigDecimal((k * s1).toDouble / 100.0 / (k * n1).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val above1 = baseEv.filter(col("value") > lit(mu)).count()
        require(above1 > 0, "planted-skew law needs a nonempty above-mean set")
        val sa = q("salted_agg_events")(spark, skewDir).localCheckpoint(true)
        val sj = q("skew_join_salted")(spark, skewDir).localCheckpoint(true)
        val saHot = sa.filter(col("user_id") === hot).select("n", "total").collect()
        val sjHot = sj.filter(col("user_id") === hot).select("n_above").collect()
        val saNon = sa.filter(col("user_id") =!= hot)
        val sjNon = sj.filter(col("user_id") =!= hot)
        val saPlain = scaled("salted_agg_events").localCheckpoint(true)
        val sjPlain = scaled("skew_join_salted").localCheckpoint(true)
        val saDiff = saNon.exceptAll(saPlain).count() + saPlain.exceptAll(saNon).count()
        val sjDiff = sjNon.exceptAll(sjPlain).count() + sjPlain.exceptAll(sjNon).count()
        val saHotOk = saHot.length == 1 &&
          saHot(0).getLong(0) == k * rows1 && saHot(0).getLong(1) == k * s1
        val sjHotOk = sjHot.length == 1 && sjHot(0).getLong(0) == k * above1
        // 3: AQE skew-split on the unsalted join, ScaleOpsSpec's knobs
        // scaled up (the hot shuffle partition carries k·base rows)
        val prev = Map(
          "spark.sql.adaptive.skewJoin.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4MB",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          // the dim side below aggregates the SAME scan the probe side
          // shuffles, so with reuse on, both SMJ children resolve to ONE
          // exchange — and OptimizeSkewedJoin refuses to split a reused
          // exchange (the split would desynchronize its other consumer).
          // A real cluster's skewed fact⋈dim joins have independent
          // sides; model that by disabling reuse for this probe only.
          "spark.sql.exchange.reuse" -> "false"
        ).map { case (c, v) =>
          val old = spark.conf.getOption(c); spark.conf.set(c, v); c -> old
        }
        val (nSmj, nSkew) = try {
          val evS = Tables.events(spark, skewDir)
          // materialize the dim side first (localCheckpoint): a computed
          // dim leaves its agg exchange directly under the SMJ sort and
          // OptimizeSkewedJoin only matches SMJ(Sort(ShuffleStage),
          // Sort(ShuffleStage)) — a real skewed fact⋈dim join reads the
          // dim from storage, which is what the severed lineage models
          val dim = evS.groupBy("user_id").agg(count(col("value")).as("nv"))
            .localCheckpoint(true)
          val j = evS.join(dim, "user_id")
            .groupBy().agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
          // collect(), NOT head(): head(n) plans a NEW limited query, so
          // j's own adaptive plan would never finalize and the walk below
          // would read the unexecuted initial plan (isFinalPlan=false)
          j.collect()
          def smjs(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
            case s: SortMergeJoinExec => Seq(s)
            case st: QueryStageExec => smjs(st.plan)
            case a: AdaptiveSparkPlanExec => smjs(a.executedPlan)
          }.flatten
          val joins = smjs(j.queryExecution.executedPlan)
          (joins.size, joins.count(_.isSkewJoin))
        } finally prev.foreach {
          case (c, Some(v)) => spark.conf.set(c, v)
          case (c, None) => spark.conf.unset(c)
        }
        val aqeSkew = nSmj > 0 && nSkew > 0
        (saDiff == 0 && saHotOk && sjDiff == 0 && sjHotOk && aqeSkew,
          s"salted_agg nonhot_diff=$saDiff hot_ok=$saHotOk " +
            s"(expect n=${k * rows1} total=${k * s1}); " +
            s"skew_join nonhot_diff=$sjDiff hot_ok=$sjHotOk " +
            s"(expect n_above=${k * above1}); " +
            s"aqe_skew_split=$aqeSkew (smj=$nSmj skew_marked=$nSkew)")
      }),

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

    ) ++ Seq(
      // ---- r13 bulk extension (verdict #4): restricted_eq for every
      // entry whose output is keyed by a replica-SHIFTED key and whose
      // per-key semantics touch only replica-local data (per-key
      // windows/groups; joins whose FKs co-shift). Replica 0 is the
      // base corpus verbatim, so scaled output restricted to base keys
      // must recover the known-correct base output exactly.
      // events.user_id co-shifts with c_custkey:
      req("acf_lags", col("user_id") < C),
      req("bollinger", col("user_id") < C),
      req("drawdown", col("user_id") < C),
      req("ewma_smooth", col("user_id") < C),
      req("first_last_day", col("user_id") < C),
      req("funnel_stages", col("user_id") < C),
      req("gapfill_daily", col("user_id") < C),
      req("golden_record", col("user_id") < C),
      req("interpolate_linear", col("user_id") < C),
      req("lag_pct_change", col("user_id") < C),
      req("mad_stats", col("user_id") < C),
      req("mode_event_type", col("user_id") < C),
      req("nav_functions", col("user_id") < C),
      req("pivot_user_event_types", col("user_id") < C),
      req("rank_functions", col("user_id") < C),
      req("row_stats", col("user_id") < C),
      req("salted_agg_events", col("user_id") < C),
      req("scd2_intervals", col("user_id") < C),
      req("sessionization", col("user_id") < C),
      req("skew_join_salted", col("user_id") < C),
      req("sql_adhoc_window", col("user_id") < C),
      req("tick_compression", col("user_id") < C),
      req("tick_compression_scaled", col("user_id") < C),
      req("trailing_window_1h", col("user_id") < C),
      req("trend_slope", col("user_id") < C),
      req("twap_daily", col("user_id") < C),
      req("union_distinct", col("user_id") < C),
      req("vwap_daily", col("user_id") < C),
      req("zscore_anomaly", col("user_id") < C),
      req("weekly_candles", col("user_id") < C),
      // c_name is replica-UNCHANGED by design, so the literal lookup
      // also matches replica customers — the key restriction recovers
      // exactly the base rows
      req("company_chart_data", col("user_id") < C),
      req("ohlcv_daily", col("user_id") < C),
      req("ohlcv_typed", col("user_id") < C),
      req("candles_incremental", col("user_id") < C),
      req("etl_pipeline", col("user_id") < C),
      // customer / order keyspaces:
      req("anti_join_inactive", col("c_custkey") < C),
      req("semi_join_active", col("c_custkey") < C),
      req("prefix_search", col("c_custkey") < C),
      req("market_map_text", col("c_custkey") < C),
      req("symbol_normalize", col("c_custkey") < C),
      req("sql_adhoc_exists", col("c_custkey") < C),
      req("sql_adhoc_lateral", col("c_custkey") < C),
      req("set_operations", col("k") < C),
      req("dedup_keep_first", col("o_custkey") < C),
      req("scd_last_writer", col("o_custkey") < C),
      req("filename_dates", col("o_orderkey") < O),
      req("point_lookup", col("o_orderkey") < O),
      req("math_functions", col("l_orderkey") < O),
      req("price_parse", col("l_orderkey") < O),
      // ORDER BY o_orderkey LIMIT 50 OFFSET 200: base keys sort first at
      // any factor, so the scaled page IS the base page, unrestricted
      req("limit_offset_page", lit(true)),
      // event keyspace:
      req("asof_join_enrich", col("event_id") < E),
      req("broadcast_enrich", col("event_id") < E),
      req("click_attribution", col("click_id") < E),
      req("range_cleanup", col("event_id") < E),
      req("stratified_sample", col("event_id") < E),
      // document keyspace (cross-replica shingle/text distinctness is
      // asserted at generation, so corpus-df terms on base docs are
      // untouched by rotated replicas):
      req("char_entropy", col("doc_id") < D),
      req("chunk_documents", col("doc_id") < D),
      req("curate_pipeline", col("doc_id") < D),
      req("decontaminate", col("doc_id") < D),
      req("decontaminate_bloom", col("doc_id") < D),
      req("decontaminate_incremental", col("doc_id") < D),
      req("dedup_exact", col("canonical_id") < D),
      req("dedup_keep_best", col("canonical_id") < D && col("kept_doc") < D),
      req("doc_fingerprint", col("doc_id") < D),
      req("dup_span_stats", col("doc_id") < D),
      req("lang_id", col("doc_id") < D),
      // mixture weights are count RATIOS (invariant under ×f) and the
      // accept test is a per-doc hash threshold — replica-local
      req("mixture_temperature_sample", col("doc_id") < D),
      // exclusive prefix sum ordered by doc_id: base docs prefix first
      req("pack_sequences", col("doc_id") < D),
      req("repetition_stats", col("doc_id") < D),
      req("string_functions_doc", col("doc_id") < D),
      req("text_quality", col("doc_id") < D),
      req("token_counts", col("doc_id") < D),
      req("train_test_split", col("doc_id") < D),
      req("unicode_normalize", col("doc_id") < D),
      req("url_extract", col("doc_id") < D),
      req("array_functions_emb", col("vec_id") < V),

      // ---- r13 bulk extension: exact ×factor laws for rollups grouped
      // by replica-invariant attributes (see factorLaw scaladoc)
      factorLaw("activity_heatmap", times = Seq("n", "cents"), eqCols = Seq("dow", "hr")),
      factorLaw("benford_digits", times = Seq("n"),
        eqCols = Seq("digit", "observed", "expected", "abs_dev")),
      factorLaw("cohort_retention", times = Seq("n_active"),
        eqCols = Seq("cohort", "day_offset", "retention")),
      factorLaw("cube_orders", times = Seq("n"), eqCols = Seq("y", "status", "g_y", "g_s")),
      factorLaw("data_profile",
        times = Seq("n_rows", "orderkey_nonnull", "orderkey_distinct", "qty_cents_sum"),
        eqCols = Seq("qty_min", "qty_max", "shipdate_min", "shipdate_max", "returnflag_card")),
      factorLaw("dau_wau_stickiness", times = Seq("dau", "wau"),
        eqCols = Seq("day", "stickiness")),
      factorLaw("embedding_stats", times = Seq("n_vectors", "sum_norm2"),
        eqCols = Seq("label", "avg_norm2")),
      // counts scale uniformly ×f, so the top-20 SET and its order are
      // preserved (ties broken by the invariant path strings)
      factorLaw("event_paths_top", times = Seq("n"), eqCols = Seq("e1", "e2", "e3")),
      factorLaw("event_transitions", times = Seq("n"),
        eqCols = Seq("prev_type", "next_type", "p")),
      factorLaw("expectations_report", times = Seq("n_violations"),
        eqCols = Seq("check_name")),
      factorLaw("feature_binning", times = Seq("n"), eqCols = Seq("bin", "lo_v", "hi_v")),
      factorLaw("hopping_candles", times = Seq("n_events", "cents"), eqCols = Seq("w_start")),
      factorLaw("ivm_join_agg", times = Seq("cnt", "sum_cents"), eqCols = Seq("grp")),
      factorLaw("join_agg_revenue", times = Seq("n_items", "revenue_cents"),
        eqCols = Seq("c_mktsegment", "o_orderstatus")),
      factorLaw("json_extract_props", times = Seq("n", "k_sum"),
        eqCols = Seq("event_type", "k_min", "k_max")),
      factorLaw("month_histogram", times = Seq("n", "total_cents"), eqCols = Seq("y", "m")),
      // registrable since r14 made the avgs exact fixed-point: the cent
      // sums and count scale ×f exactly; the avg columns are dropped
      // because round((f·S)/100/(f·n), 4) divides through different
      // double operands than round(S/100/n, 4) — sub-ulp, and their
      // cross-engine exactness is already pinned by the sf1 oracle
      factorLaw("pricing_summary_q1",
        times = Seq("sum_qty_cents", "sum_base_cents", "sum_disc_cents",
          "sum_charge_cents", "count_order"),
        eqCols = Seq("l_returnflag", "l_linestatus"),
        drop = Seq("avg_qty", "avg_price", "avg_disc")),
      factorLaw("pivot_event_types",
        times = Seq("n_click", "n_purchase", "n_view", "cents_click", "cents_purchase", "cents_view"),
        eqCols = Seq("day")),
      // mean_value dropped: (f·S/100)/(f·n) rounds through a different
      // intermediate than (S/100)/n — sub-ulp, but exceptAll is exact;
      // the column's cross-engine exactness is pinned by the sf1 oracle
      factorLaw("resample_daily", times = Seq("volume"),
        eqCols = Seq("day", "open", "high", "low", "close"), drop = Seq("mean_value")),
      factorLaw("rollup_orders", times = Seq("n", "total_cents"), eqCols = Seq("y", "m")),
      factorLaw("sql_adhoc_agg", times = Seq("n_orders", "total_cents"),
        eqCols = Seq("o_orderpriority")),
      factorLaw("sql_adhoc_grouping_sets", times = Seq("n", "total_cents"),
        eqCols = Seq("o_orderstatus", "o_orderpriority")),
      factorLaw("sql_adhoc_join", times = Seq("n_customers", "acctbal_cents"),
        eqCols = Seq("n_name")),
      factorLaw("sql_adhoc_pivot",
        times = Seq("f_n", "f_cents", "o_n", "o_cents", "p_n", "p_cents"),
        eqCols = Seq("c_mktsegment")),
      factorLaw("star_join_q5", times = Seq("n_items", "revenue_cents"), eqCols = Seq("n_name")),
      factorLaw("string_agg_segments", times = Seq("n_customers"),
        eqCols = Seq("n_name", "segments")),
      factorLaw("table_stats", times = Seq("n_events", "n_users"),
        eqCols = Seq("n_types", "min_day", "max_day")),
      factorLaw("table_stats_approx", times = Seq("n_events", "n_users_exact"),
        eqCols = Seq("n_types_exact", "users_within_5pct", "types_within_5pct")),
      factorLaw("union_schema_drift", times = Seq("n_rows", "n_with_value", "cents"),
        eqCols = Seq("event_type")),
      factorLaw("variant_extract_props", times = Seq("n", "k_sum"),
        eqCols = Seq("event_type", "k_decade"))
    ).toMap

    checks
  }
}
