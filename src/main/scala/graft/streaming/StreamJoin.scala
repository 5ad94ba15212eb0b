package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-stream interval join — attribution, the canonical two-stream
  * pattern: every purchase is joined to the same user's clicks in the
  * preceding attribution window.
  *
  * Scale design: both sides hash-partition on user_id (one exchange
  * each), so each of 1000 executors joins only its key range. The
  * interval condition plus BOTH watermarks let the engine compute how
  * long a buffered row can still find a partner and EVICT it after
  * that — state is bounded by (attribution window + lateness) of
  * stream history, not by the stream's full past, which is what makes
  * the join runnable on an unbounded 100 TB stream. An un-watermarked
  * or equality-only stream-stream join would buffer forever.
  */
object StreamJoin {

  /** Purchases attributed to the same user's clicks within
    * `attributionWindow` before the purchase (inclusive bounds).
    * Input is [[EventCodec.parse]]'s shape; the two sides are the one
    * parsed stream filtered by event type, as a Kafka deployment would
    * split a topic.
    */
  def attribution(
      events: DataFrame,
      attributionWindow: String = "1 minute",
      lateness: String = "1 minute"): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "CLICK")
      .select(col("user_id"), col("timestamp").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events
      .filter(col("event_type") === "PURCHASE")
      .select(col("user_id").as("p_user_id"), col("timestamp").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(
      clicks,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL '$attributionWindow'"),
      "inner")
      .select(col("p_user_id").as("user_id"), col("purchase_ts"), col("click_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  def start(
      events: DataFrame,
      queryName: String,
      attributionWindow: String = "1 minute",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      attribution(events, attributionWindow, lateness)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}
