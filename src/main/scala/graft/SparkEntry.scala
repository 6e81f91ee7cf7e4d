package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain catalogs (graft.queries.*);
  * every entry with an oracle is hash-checked by the driver against
  * DuckDB running `oracleSql` on the same parquet tables.
  */
object SparkEntry {

  private def catalog: Seq[QueryDef] =
    graft.queries.CandleQueries.entries ++
      graft.queries.WindowQueries.entries ++
      graft.queries.JoinQueries.entries ++
      graft.queries.AggQueries.entries ++
      graft.queries.FunctionQueries.entries ++
      graft.queries.SqlQueries.entries ++
      graft.queries.TextQueries.entries ++
      graft.queries.SimilarityQueries.entries ++
      graft.queries.MultimodalQueries.entries ++
      graft.queries.PipelineQueries.entries ++
      graft.queries.ProfileQueries.entries ++
      graft.queries.TimeSeriesQueries.entries ++
      graft.queries.CorpusQueries.entries ++
      graft.queries.GraphQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference ETL as one DAG: filter → compress → candle →
    * broadcast-enrich (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("etl_pipeline")(spark, "/root/testdata/sf0.001")

  /** Full QueryDefs (name + oracle + runner) for audit harnesses that
    * need the oracle TEXT next to the runner (DeterminismAudit). */
  def catalogEntries: Seq[QueryDef] = catalog

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // toMap keeps the LAST duplicate key — a name collision would
    // silently drop an entry from the correctness run (it happened:
    // two rounds independently added a pivot_event_types and one was
    // shadowed unverified for a round). Fail loudly instead.
    val names = catalog.map(_.name)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate catalog query names: ${dups.mkString(", ")}")
    catalog.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case QueryDef(n, Some(sql), _) => n -> sql }.toMap

  /** Entries whose CONFIGURATION exists only to be DuckDB-checkable, with
    * the production configuration oracled by a sibling entry — excluded
    * from the headline bench (they still run in every Verify correctness
    * sweep; nothing loses oracle coverage).
    *
    * `embedding_clusters`: its θ=0.4 threshold sits in the synthetic
    * noise tail, so proving LSH lossless against the exact recursive-CTE
    * oracle forces 128 tables × 4-bit bands — a candidate volume nobody
    * would deploy (SCALE.md sweep: ~16× the production cost). The
    * production path — planted near-dups, θ=0.9, 16×12, sized by
    * `Similarity.lshConfigFor` — is fully oracled end-to-end by
    * `embedding_clusters_strict`, which IS in the bench. Timing the
    * oracle-config twin told the headline number nothing about the
    * engine, only about the oracle's threshold choice.
    */
  val correctnessOnly: Set[String] = Set("embedding_clusters")
}
