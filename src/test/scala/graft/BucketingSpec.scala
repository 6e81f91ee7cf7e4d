package graft

import org.apache.spark.sql.functions._

/** Bucketed-join co-location (SCALE.md): two tables bucketed AND sorted
  * on the join key join with NO shuffle exchange and NO sort — the
  * storage layout pre-pays the partitioning once at write time, which is
  * the difference between re-shuffling 100 TB per join and reading
  * co-located buckets. Spark-native analog of the reference warehouse's
  * clustered (cid, date) primary-key tables
  * (`etl/timescaledb_model.py:29-57`).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed sorted tables has no shuffle and no sort") {
    val ev = Tables.events(spark, sf).select($"user_id", $"value")
    val users = Tables.events(spark, sf).groupBy($"user_id")
      .agg(max($"value").as("max_value"))
    try {
      ev.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("graft_ev_bucketed")
      users.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("graft_users_bucketed")
      // force a sort-merge join so a shuffle exchange would be visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_ev_bucketed")
        .join(spark.table("graft_users_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.linesIterator.take(25).mkString("\n"))
      assert(joined.count() == ev.count()) // co-location changed the plan, not the result
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_users_bucketed")
    }
  }

  test("z-ordered layout tightens per-file bounding boxes vs single-key layout") {
    import graft.operators.ZOrder
    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey".cast("long").as("pk"), $"l_suppkey".cast("long").as("sk"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      // baseline: the best SINGLE-key layout (range-partition + sort on pk)
      li.repartitionByRange(8, $"pk").sortWithinPartitions($"pk")
        .write.mode("overwrite").parquet(s"$tmp/by_pk")
      ZOrder.writeZOrdered(li, $"pk", $"sk", bits = 11, nFiles = 8, path = s"$tmp/by_z")
      val (xPk, yPk) = ZOrder.spanSums(spark.read.parquet(s"$tmp/by_pk"), $"pk", $"sk")
      val (xZ, yZ) = ZOrder.spanSums(spark.read.parquet(s"$tmp/by_z"), $"pk", $"sk")
      // the single-key layout leaves every file spanning ~all of sk; the
      // curve layout must cut the total sk span (files a predicate on sk
      // scans) while keeping pk still prunable (total pk span well under
      // the every-file-spans-everything worst case yPk implies for sk)
      assert(yZ < 0.75 * yPk, s"z-order sk span-sum $yZ not < 0.75x single-key $yPk")
      val fullPk = li.agg(max($"pk") - min($"pk")).head.getLong(0).toDouble
      assert(xZ < 0.75 * 8 * fullPk, s"pk no longer prunable: $xZ vs worst ${8 * fullPk}")
      // and the layout is a reshuffle, not a rewrite: same rows
      assert(spark.read.parquet(s"$tmp/by_z").count() == li.count())
    } finally {
      val dir = new java.io.File(tmp)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("quantile-rank z-order keeps skipping under a heavy-tailed key") {
    import graft.operators.ZOrder
    // zipf-ish x: value v with mass ∝ 1/v over [1, 10^6); uniform y.
    // min/max normalization maps ~all rows into the lowest curve cells
    // (the head is a vanishing fraction of the RANGE but most of the
    // MASS) — point predicates on hot x values then scan ~every file
    val skewed = spark.range(60000).select(
      floor(exp(rand(7) * math.log(1000000.0))).cast("long").as("x"),
      pmod(hash($"id" * 31), lit(1000)).cast("long").as("y"))
      .localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("graft_zrank").toString
    try {
      ZOrder.writeZOrdered(skewed, $"x", $"y", bits = 11, nFiles = 16, path = s"$tmp/minmax")
      ZOrder.writeZOrderedByRank(skewed, $"x", $"y", bits = 6, nFiles = 16, path = s"$tmp/rank")
      val fMinmax = ZOrder.expectedFilesScanned(spark.read.parquet(s"$tmp/minmax"), $"x")
      val fRank = ZOrder.expectedFilesScanned(spark.read.parquet(s"$tmp/rank"), $"x")
      // measured against the data's own distribution, the rank layout
      // must scan strictly fewer files for a typical x point predicate
      assert(fRank < 0.7 * fMinmax,
        f"rank z-order scans $fRank%.1f files vs min/max $fMinmax%.1f — no skew win")
      assert(spark.read.parquet(s"$tmp/rank").count() == 60000L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("morton interleave round-trips: even bits are x, odd bits are y") {
    import graft.operators.ZOrder
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (2047L, 2047L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue($"x", $"y", 11))
    val out = df.select("x", "y", "z").as[(Long, Long, Long)].collect().toMap2
    def interleave(x: Long, y: Long): Long =
      (0 until 11).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    out.foreach { case ((x, y), z) => assert(z == interleave(x, y), s"($x,$y)") }
    // locality sanity: z(0,0)=0; z(1,0)=1; z(0,1)=2
    assert(out((0L, 0L)) == 0L && out((1L, 0L)) == 1L && out((0L, 1L)) == 2L)
  }

  implicit private class PairMap(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
