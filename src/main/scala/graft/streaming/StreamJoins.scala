package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — the attribution shape the reference's
  * batch funnel (`dashboard/tabs/tab3.py:41-100` stage queries) would need
  * the moment both sides arrive as live streams. Both inputs carry
  * event-time watermarks and the join condition bounds one event time
  * against the other on BOTH ends, so Spark can evict state from both
  * sides: state size is O(events inside the lookback window), never
  * O(stream history) — the property that lets this run forever on a
  * 1000-executor cluster.
  *
  * Expected columns: views(user_id, view_id, view_ts),
  * clicks(user_id, click_id, click_ts).
  */
object StreamJoins {

  private def joined(views: DataFrame, clicks: DataFrame,
                     lookback: String, delay: String, joinType: String): DataFrame = {
    val v = views.withWatermark("view_ts", delay)
    val c = clicks.withWatermark("click_ts", delay)
    v.join(
        c,
        v("user_id") === c("user_id") &&
          c("click_ts") >= v("view_ts") &&
          c("click_ts") <= v("view_ts") + expr(s"INTERVAL $lookback"),
        joinType)
      .select(v("user_id"), col("view_id"), col("view_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Attribute each click to every view by the same user within the
    * `lookback` window before it (inner join — only matched pairs).
    * `delay` is the per-side watermark: how much event-time disorder the
    * sources may exhibit before rows are considered late.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      lookback: String = "48 hours",
                      delay: String = "1 hour"): DataFrame =
    joined(views, clicks, lookback, delay, "inner")

  /** Left-outer variant: every view emits — joined to each in-window
    * click, or null-extended exactly once when the watermark proves no
    * matching click can still arrive (view_ts + lookback + delay has
    * passed). The null-extended row is what a re-engagement pipeline
    * consumes; it CANNOT be emitted eagerly because a click may still be
    * in flight, which is why the watermark is load-bearing here.
    */
  def attributeClicksOuter(views: DataFrame, clicks: DataFrame,
                           lookback: String = "48 hours",
                           delay: String = "1 hour"): DataFrame =
    joined(views, clicks, lookback, delay, "left_outer")
}
