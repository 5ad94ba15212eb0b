package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Per-user funnel progress. Stage times as epoch micros, −1 = not
  * reached (longs survive state-store serialization untouched).
  */
case class FunnelState(t1Us: Long, t2Us: Long, t3Us: Long)

/** One emitted funnel outcome per user: either a completed conversion
  * (depth 3, emitted the moment the purchase lands) or the partial
  * depth reached when the conversion window expired.
  */
case class FunnelResult(
    user_id: String,
    depth: Int,
    signup_at: Timestamp,
    converted_at: Timestamp,
    lag_sec: Double)

/** Streaming conversion funnel SIGNUP → CLICK → PURCHASE — the
  * real-time twin of [[graft.operators.EventAnalytics.funnel]]'s
  * sequential-min semantics: stage n advances only on a qualifying
  * event at-or-after stage n−1, each user converts at most once, and
  * users who stall are flushed with their partial depth once the
  * event-time watermark passes their conversion window. A distinct
  * state machine from [[Sessionize]]: monotone stage advancement with
  * max-once emission, not gap-splitting.
  *
  * Scale design (SURVEY §2.6 T2 discipline): state is three longs per
  * in-flight user, keyed in the partitioned state store (one shuffle
  * per micro-batch, each executor owns its key range);
  * `EventTimeTimeout` evicts every user `window` past their signup, so
  * state is bounded by users signing up within window + lateness —
  * never by users ever seen. Within-batch events fold in event-time
  * order, so replay produces identical outcomes; across batches the
  * one-pass machine equals the batch operator whenever stage events
  * arrive within the lateness horizon (the watermark contract).
  */
object Funnel {

  /** Funnel outcomes from a parsed events stream (columns `timestamp`,
    * `user_id`, `event_type` — [[EventCodec.parse]]'s shape). Emits one
    * row per RESOLVED user (converted or expired), append mode.
    */
  def conversions(
      events: DataFrame,
      window: String = "10 minutes",
      lateness: String = "1 minute"): Dataset[FunnelResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(window))
      .microseconds
    events
      .withWatermark("timestamp", lateness)
      .selectExpr("user_id", "timestamp", "event_type")
      .as[(String, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(windowUs))
  }

  private def result(uid: String, s: FunnelState): FunnelResult = {
    val depth = if (s.t3Us >= 0) 3 else if (s.t2Us >= 0) 2 else 1
    val end = if (s.t3Us >= 0) s.t3Us else if (s.t2Us >= 0) s.t2Us else s.t1Us
    FunnelResult(uid, depth,
      new Timestamp(s.t1Us / 1000),
      new Timestamp(end / 1000),
      (end - s.t1Us) / 1e6)
  }

  private def fold(windowUs: Long)(
      uid: String,
      values: Iterator[(String, Timestamp, String)],
      state: GroupState[FunnelState]): Iterator[FunnelResult] = {
    if (values.isEmpty) {
      // Watermark passed signup + window: flush the partial depth.
      val out = state.getOption.map(result(uid, _))
      state.remove()
      out.iterator
    } else {
      var emitted = List.empty[FunnelResult]
      var st = state.getOption
      values.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, typ) =>
        val us = ts.getTime * 1000
        st = (st, typ) match {
          case (None, "SIGNUP") => Some(FunnelState(us, -1L, -1L))
          case (Some(s), "CLICK") if s.t1Us >= 0 && s.t2Us < 0 && us >= s.t1Us =>
            Some(s.copy(t2Us = us))
          case (Some(s), "PURCHASE") if s.t2Us >= 0 && s.t3Us < 0 && us >= s.t2Us =>
            val done = s.copy(t3Us = us)
            emitted ::= result(uid, done)
            None // converted: emit once, evict immediately
          case (other, _) => other // pre-signup events, repeats: no-op
        }
      }
      st match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(
            math.max(s.t1Us / 1000 + windowUs / 1000,
              state.getCurrentWatermarkMs + 1))
        case None => if (state.exists) state.remove()
      }
      emitted.reverse.iterator
    }
  }

  def start(
      events: DataFrame,
      queryName: String,
      window: String = "10 minutes",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      conversions(events, window, lateness)
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}
