package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention and staged-funnel plans, factored out of the query
  * catalog so the boundary property specs drive EXACTLY the shipped
  * plan (not a spec-local re-implementation that could drift).
  *
  * Boundary semantics, pinned by FunnelPropertySpec:
  *  - cohort day = DATE of the user's first 'signup' (a signup exactly
  *    at midnight belongs to that day);
  *  - activity joins at DATE grain with `d >= cohort` — same-day
  *    activity BEFORE the signup instant still counts as offset 0
  *    (day-grain retention, the growth-dashboard convention);
  *  - funnel stages advance on STRICT inequality: a click at exactly
  *    t_view (equal timestamps) does not count as post-view, and a
  *    purchase at exactly t_click does not count as post-click.
  */
object Funnels {

  /** Cohort retention triangle over (user_id, ts, event_type) events:
    * one row per (cohort, day_offset) with distinct active users and
    * the retention ratio (round 4 — a ratio of exact counts, so
    * deterministic across engines). Shuffles only on user_id and the
    * small (cohort, offset) key — no window over the event stream.
    */
  def cohortRetention(ev: DataFrame): DataFrame = {
    val first = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
      .select(col("user_id"), col("t0").cast("date").as("cohort"))
    val act = ev.select(col("user_id"), col("ts").cast("date").as("d")).distinct()
    val cs = first.groupBy("cohort").agg(countDistinct("user_id").as("cohort_size"))
    act.join(first, "user_id")
      .filter(col("d") >= col("cohort"))
      .select(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"),
        col("user_id"))
      .groupBy("cohort", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(cs, "cohort")
      .select(col("cohort"), col("day_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 4).as("retention"))
  }

  /** Staged funnel per user: first view → first click STRICTLY after
    * that view → first purchase STRICTLY after that click. Each stage
    * is one filtered min-aggregate joined on user_id.
    */
  def funnelStages(ev: DataFrame): DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .withColumn("stages",
        (lit(1) + col("t_click").isNotNull.cast("int") + col("t_purchase").isNotNull.cast("int"))
          .cast("long"))
      .select("user_id", "t_view", "t_click", "t_purchase", "stages")
  }
}
