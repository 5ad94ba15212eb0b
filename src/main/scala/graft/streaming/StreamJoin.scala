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
      lateness: String = "1 minute"): DataFrame =
    attributionJoin(events, attributionWindow, lateness, "inner")

  /** Left-outer attribution — the funnel table real attribution needs:
    * EVERY purchase emits exactly once, matched purchases with each
    * qualifying click, organic ones with null click_ts / lag_us.
    *
    * The outer emission is the watermark-subtle half: a purchase with
    * no click yet cannot emit null eagerly (its click may still be in
    * flight), so the engine buffers it until the GLOBAL watermark (min
    * across both sides' event-time columns) passes the end of its
    * attribution window plus lateness — the earliest point where "no
    * qualifying click can ever arrive" is provable — then emits the
    * null row exactly once and evicts the state. Same bounded-state
    * guarantee as the inner form: state is (window + lateness) of
    * history, never the stream's past, on both the 1000-executor and
    * the unbounded-time axes. (Batch analogue: `join_full_outer`'s
    * funnel table, operators/Relational.scala.)
    */
  def attributionOuter(
      events: DataFrame,
      attributionWindow: String = "1 minute",
      lateness: String = "1 minute"): DataFrame =
    attributionJoin(events, attributionWindow, lateness, "leftOuter")

  private def attributionJoin(
      events: DataFrame,
      attributionWindow: String,
      lateness: String,
      joinType: String): DataFrame = {
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
      joinType)
      .select(col("p_user_id").as("user_id"), col("purchase_ts"), col("click_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Streaming twin of the batch keyless banded time-range join
    * (`EventAnalytics.timeBandJoin`): every purchase is paired with
    * every click by ANYONE — deliberately no user equi-key — within
    * ±[[graft.operators.EventAnalytics.BandUs]] (±300 s). Emits the
    * matched PAIRS (append-mode-safe); the batch twin's per-purchase
    * counts are one grouped aggregate downstream.
    *
    * Why banding matters MORE here than in batch: a stream-stream
    * join shuffles both sides by the join's equi-keys. With only the
    * theta predicate |t_c − t_p| ≤ B there is no equi-key, so every
    * row would land in ONE state partition — a single-task bottleneck
    * no 1000-executor cluster can help with. Banding both sides on
    * ⌊t/B⌋ and exploding the probe side to its 3 adjacent buckets
    * turns it into a plain hash-partitioned stream-stream equi-join,
    * exactly the batch trick (each click lives in ONE bucket, so the
    * band match needs no dedup). The symmetric ±B range condition on
    * the two watermarked event-time columns is what lets the engine
    * evict buffered rows once the global watermark passes their last
    * possible partner — state stays (2B + lateness) of history on an
    * unbounded stream.
    */
  def timeBandPairs(
      events: DataFrame,
      lateness: String = "1 minute"): DataFrame = {
    val bandUs = graft.operators.EventAnalytics.BandUs
    val clicks = events
      .filter(col("event_type") === "CLICK")
      .select(expr(s"unix_micros(timestamp) div $bandUs").as("band"),
        col("user_id").as("ctx_user"), col("timestamp").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events
      .filter(col("event_type") === "PURCHASE")
      .select(col("user_id"), col("timestamp").as("purchase_ts"),
        explode(sequence(
          expr(s"unix_micros(timestamp) div $bandUs") - 1,
          expr(s"unix_micros(timestamp) div $bandUs") + 1)).as("p_band"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(
      clicks,
      col("band") === col("p_band") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL '${bandUs / 1000000L}' SECOND") &&
        col("click_ts") <= col("purchase_ts") + expr(s"INTERVAL '${bandUs / 1000000L}' SECOND"),
      "inner")
      .select(col("user_id"), col("purchase_ts"), col("ctx_user"), col("click_ts"),
        (unix_micros(col("click_ts")) - unix_micros(col("purchase_ts")))
          .as("delta_us"))
  }

  def startTimeBand(
      events: DataFrame,
      queryName: String,
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      timeBandPairs(events, lateness)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()

  def start(
      events: DataFrame,
      queryName: String,
      attributionWindow: String = "1 minute",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None,
      outer: Boolean = false): StreamingQuery = {
    val joined =
      if (outer) attributionOuter(events, attributionWindow, lateness)
      else attribution(events, attributionWindow, lateness)
    Patterns.withTrigger(
      joined
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
  }
}
