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
  /** Audit hook (PlanFingerprints --aqe): when set, called with each
    * truncated DataFrame AFTER its eager checkpoint executed — at that
    * point the DataFrame's `queryExecution.executedPlan` is the FINAL
    * adaptive plan, so iteration-BODY shapes of checkpointed loops
    * (kcore/bfs/sssp/mass-flow rounds, star-contraction steps) can be
    * fingerprinted without re-running the loop. The r14 AQE pin only saw
    * these entries' final checkpointed read (`rddscan=1 shuffle=1
    * sort=1`) — the runtime guard never reached the loop body where a
    * strategy decay would actually cost. Never set in production paths;
    * reset to the no-op in a finally.
    */
  @volatile private[graft] var onTruncate: DataFrame => Unit = _ => ()

  // setCheckpointDir is NOT idempotent: each call mkdirs a fresh UUID
  // subdirectory under the given path and points the context at it, so
  // calling it per round would scatter a 16-round loop across 16
  // directories and pay a remote mkdirs RPC each time. Set once per
  // (context, dir) — the stored form is dir/<uuid>, so it cannot be
  // compared against the caller's raw path directly.
  private val configured =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()
  // read/write lock per context: concurrent truncates with the SAME dir
  // share the read side (eager checkpoints run as parallel jobs), while a
  // dir CHANGE takes the write side — so one loop's df.checkpoint() can
  // never land under a dir another thread swapped in between the check
  // and the checkpoint (check-then-act on shared SparkContext state).
  private val locks = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext, java.util.concurrent.locks.ReentrantReadWriteLock]()

  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val lock = locks.computeIfAbsent(sc,
          _ => new java.util.concurrent.locks.ReentrantReadWriteLock())
        val read = lock.readLock()
        read.lock()
        if (configured.get(sc) != dir) {
          // upgrade: drop read, take write, re-check, set, downgrade.
          // record AFTER the set succeeds: caching first would latch a
          // failed configuration (transient FS error on the first call)
          // and every later call would skip the retry, failing forever
          read.unlock()
          val write = lock.writeLock()
          write.lock()
          try {
            if (configured.get(sc) != dir) {
              sc.setCheckpointDir(dir)
              configured.put(sc, dir)
            }
            read.lock() // downgrade before releasing write
          } finally write.unlock()
        }
        try {
          val out = df.checkpoint(eager = true)
          onTruncate(df)
          out
        } finally read.unlock()
      case None =>
        val out = df.localCheckpoint(eager = true)
        onTruncate(df)
        out
    }
}
