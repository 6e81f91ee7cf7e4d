package graft

import org.apache.spark.sql.functions._

/** The last untested reference behavior: the dashboard serves FIVE
  * parallel gunicorn threads of ad-hoc SQL (`docker/dashboard/Dockerfile`
  * CMD `--workers=1 --threads=5`) while the ETL container keeps writing.
  * Spark supports exactly this — one SparkSession, many threads, jobs
  * interleaved by the scheduler — but nothing proved it against OUR
  * write path. This spec runs 5 reader threads of ad-hoc SQL against the
  * day-partitioned warehouse WHILE a streaming upsert loop (readStream →
  * foreachBatch → Warehouse.upsertDayPartitioned) lands live batches,
  * and asserts the isolation contract Warehouse promises:
  *
  *  - readers NEVER see `_staging-*` files (the `_` prefix hides staging
  *    from file listings — checked via input_file_name on every read);
  *  - history days the stream never touches read back byte-stable
  *    (identical count + exact cent sum on every concurrent read);
  *  - no reader starves: every thread completes iterations while the
  *    write loop is live, and none throws;
  *  - afterwards the table equals history ∪ live exactly (the upsert
  *    loop converged under concurrency).
  */
class ConcurrentSqlSpec extends SparkSpec {

  test("5 ad-hoc SQL reader threads stay isolated from a live streaming upsert loop") {
    import spark.implicits._
    import graft.sources.{Sources, Warehouse}
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts", $"value")
    val maxDay = ev.agg(max(to_date($"ts"))).as[java.sql.Date].head().toLocalDate
    val cut = maxDay.minusDays(7).toString
    val history = ev.filter(to_date($"ts") < cut)
    val live = ev.filter(to_date($"ts") >= cut)
    assert(history.count() > 0 && live.count() > 0, "fixture must span the cut")

    val whPath = java.nio.file.Files.createTempDirectory("graft-conc-wh").toString
    Sources.writeDayPartitioned(history, "ts", "user_id", whPath)
    val pinned = history
      .agg(count(lit(1)), sum(round($"value" * 100).cast("long")))
      .as[(Long, Long)].head()

    // live rows staged as 3 chunks with increasing mtimes (the
    // FileStreamSource replay order), one micro-batch each
    val feedDir = java.nio.file.Files.createTempDirectory("graft-conc-feed")
    val cuts = Seq(maxDay.minusDays(4).toString, maxDay.minusDays(2).toString)
    val bounds = (cut +: cuts) :+ "9999-12-31"
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val f = feedDir.resolve(s"chunk$i")
      live.filter(to_date($"ts") >= lo && to_date($"ts") < hi)
        .coalesce(1).write.parquet(f.toString)
      f.toFile.listFiles().foreach(_.setLastModified(1700000000000L + i * 60000L))
    }

    val readerError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val duringStream = new java.util.concurrent.atomic.AtomicInteger(0)
    val total = new java.util.concurrent.atomic.AtomicInteger(0)
    // the first micro-batch waits on this until every reader has finished
    // one full lap — otherwise on a fast machine the 3 micro-batches can
    // drain before any reader overlaps the stream and the >=5 assert
    // below flakes on pure timing
    val firstLap = new java.util.concurrent.CountDownLatch(5)
    @volatile var streaming = true
    @volatile var stop = false
    val readers = (0 until 5).map { _ =>
      new Thread(() => {
        var lapped = false
        try {
          while (!stop) {
            // fresh read = fresh file listing, like every dashboard query
            val r = spark.read.parquet(whPath)
              .filter($"day" < lit(cut))
              .select($"value", input_file_name().as("f"))
              .agg(count(lit(1)), sum(round($"value" * 100).cast("long")),
                collect_set($"f"))
              .as[(Long, Long, Seq[String])].head()
            assert((r._1, r._2) == pinned,
              s"history days drifted under a concurrent upsert: $r vs $pinned")
            assert(!r._3.exists(_.contains("_staging-")),
              s"reader saw staging files: ${r._3.filter(_.contains("_staging-"))}")
            // and the reference's ad-hoc surface proper, same session
            val n = graft.sql.Views.adhoc(spark, sf,
              "SELECT count(*) AS n FROM events").as[Long].head()
            assert(n > 0)
            if (streaming) duringStream.incrementAndGet()
            total.incrementAndGet()
            if (!lapped) { lapped = true; firstLap.countDown() }
          }
        } catch { case t: Throwable => readerError.compareAndSet(null, t) }
      })
    }
    readers.foreach(_.start())

    val stream = spark.readStream.schema(live.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir.toString + "/*")
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // bounded gate, not a hard await: if a reader errors before its
        // first lap it never counts down — proceed and let the
        // readerError assert report the real failure
        firstLap.await(60, java.util.concurrent.TimeUnit.SECONDS)
        if (!batch.isEmpty)
          Warehouse.upsertDayPartitioned(spark, whPath, batch, "ts", Seq("event_id"))
    }.start()
    try q.processAllAvailable() finally { streaming = false; q.stop() }
    // let readers take at least one more full post-stream lap, then stop
    Thread.sleep(500)
    stop = true
    readers.foreach(_.join(120000))
    assert(readerError.get() == null,
      s"a concurrent reader failed: ${Option(readerError.get()).map(_.toString)}")
    assert(duringStream.get() >= 5,
      s"readers starved during the write loop: only ${duringStream.get()} iterations overlapped")

    // convergence: the table is exactly history ∪ live
    val after = spark.read.parquet(whPath).select($"event_id", $"user_id", $"ts", $"value")
    assert(after.exceptAll(ev).isEmpty && ev.exceptAll(after).isEmpty,
      "warehouse after the concurrent upsert loop != history ∪ live")
  }
}
