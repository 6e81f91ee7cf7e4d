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
}
