package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession

/** Measures the thing `Similarity.lshConfigFor` claims: at a corpus 100×
  * the catalog fixture, a PINNED LSH config (the catalog entries' 16×12,
  * frozen because their DuckDB oracles state those constants) pays a
  * quadratic candidate term, while the n-aware config — bucket space
  * grown with the corpus, table count re-derived from the recall
  * algebra — keeps candidates linear and finds the same pairs.
  *
  * Run against the sf10 replica set (200k vectors; every true near-dup
  * pair is WITHIN a replica by the generator's rotation invariant, so
  * both configs must report the same pair count — recall equivalence on
  * this corpus, not just speed).
  *
  * Usage: tools/run_main.sh graft.LshSizingSmoke [sfDir] [threshold]
  */
object LshSizingSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val theta = if (args.length > 1) args(1).toDouble else 0.9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-lsh-sizing")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // plant 2,000 perturbed duplicates (first-dim +0.05, cos ≈ 0.999 —
    // the embedding_clusters_strict recipe) so the two configs have REAL
    // pairs to agree on; without them a noise corpus has zero pairs at
    // production thresholds and "same result" is vacuous
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") < 2000)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + IF(i = 0, CAST(0.05 AS FLOAT), CAST(0 AS FLOAT)))")
          .as("embedding"))
    val emb = base.unionByName(planted)
    val n = emb.count()
    val (tables, bandBits) = Similarity.lshConfigFor(n, theta)
    def timePairs(t: Int, b: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = Similarity.nearDupPairs(emb, threshold = theta, tables = t, bandBits = b).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (nSized, sSized) = timePairs(tables, bandBits)
    val (nPinned, sPinned) = timePairs(16, 12)
    println(
      f"""{"n_vectors":$n,"threshold":$theta,"planted_pairs":2000,""" +
        f""""pinned":{"tables":16,"band_bits":12,"pairs":$nPinned,"secs":$sPinned%.1f},""" +
        f""""sized":{"tables":$tables,"band_bits":$bandBits,"pairs":$nSized,"secs":$sSized%.1f},""" +
        f""""pair_counts_equal":${nPinned == nSized}}""")
    spark.stop()
  }
}
