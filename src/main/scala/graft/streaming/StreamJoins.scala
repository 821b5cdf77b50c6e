package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream joins — the remaining Structured Streaming operator
  * family on top of the reference's parse→derive chain
  * (`streaming/kafka_to_influxdb.py:77-95`): correlating two live event
  * feeds (e.g. card swipes vs fraud-rule hits, clicks vs purchases)
  * without landing either in a batch store first.
  *
  * Both joins are EVENT-TIME BOUNDED, which is what makes them runnable
  * forever: each side carries a watermark and the join predicate bounds
  * how far the two sides' timestamps may drift, so Spark's symmetric
  * hash join can EVICT state older than `watermark - bound` instead of
  * buffering both streams in full. State per executor is O(events within
  * the attribution window), not O(stream history) — the property that
  * holds at 100 TB/day.
  *
  * Shuffle: each micro-batch exchanges both sides on `user_id` once; the
  * stateful join operator keeps the two per-key buffers co-partitioned
  * across batches (no re-shuffle of old state).
  */
object StreamJoins {

  /** Late-data allowance on both sides. */
  val WatermarkDelay = "1 minute"

  /** Attribution horizon: a purchase joins a click at most this far back. */
  val AttributionWindowSec = 600L

  /** Inner click→purchase attribution: purchases matched to the clicks
    * they followed within [[AttributionWindowSec]], per user.
    *
    * Inputs are StreamPipeline.parse-shaped frames (`event_id, user_id,
    * event_type, value, ts`). Output: one row per (click, purchase) pair.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"), col("ts").as("purchase_ts"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $AttributionWindowSec SECONDS"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("purchase_value"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Left-outer variant: every click emitted; unconverted clicks surface
    * with NULL purchase columns once the watermark proves no purchase can
    * still arrive inside the window — the streaming spelling of the
    * funnel "drop-off" query (a05's batch semantics, live). */
  def attributionJoinLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", WatermarkDelay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"), col("ts").as("purchase_ts"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $AttributionWindowSec SECONDS"),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("purchase_value"),
        col("click_ts"), col("purchase_ts"))
  }
}
