package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative loops (MassFlow's Pregel rounds,
  * Dedup's star-contraction), with a choice the single-JVM default
  * cannot make for the caller:
  *
  *  - `None` → `localCheckpoint` (eager): blocks live on executor local
  *    storage. Fast, no filesystem dependency — but on a REAL cluster an
  *    executor lost mid-loop takes its blocks with it and the job dies
  *    (local checkpoints sever lineage, so there is nothing to recompute
  *    from). Correct for local[N] and for clusters where a rare loop
  *    retry is acceptable.
  *  - `Some(dir)` → reliable `checkpoint()` under `dir` (HDFS/S3/DBFS on
  *    a cluster): per-round state is persisted to fault-tolerant
  *    storage, so executor loss costs one round's recompute, never the
  *    job. The price is a filesystem round-trip per iteration — pay it
  *    when the loop is long or the cluster is preemptible.
  *
  * Old rounds' checkpoint data is reclaimed by the ContextCleaner on GC
  * (reliable checkpoints additionally honor
  * `spark.cleaner.referenceTracking.cleanCheckpoints`).
  */
object Checkpoints {
  // setCheckpointDir is NOT idempotent: each call mkdirs a fresh UUID
  // subdirectory under the given path and points the context at it, so
  // calling it per round would scatter a 16-round loop across 16
  // directories and pay a remote mkdirs RPC each time. Set once per
  // (context, dir) — the stored form is dir/<uuid>, so it cannot be
  // compared against the caller's raw path directly.
  private val configured =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()

  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // record AFTER the set succeeds: caching first would latch a
        // failed configuration (transient FS error on the first call)
        // and every later call would skip the retry, failing forever
        if (configured.get(sc) != dir) {
          sc.setCheckpointDir(dir)
          configured.put(sc, dir)
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
}
