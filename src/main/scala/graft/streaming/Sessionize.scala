package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** One in-flight session per user. Timestamps as epoch micros (longs
  * survive state-store serialization untouched; Timestamp would go
  * through the session timezone twice).
  */
case class SessionState(
    startUs: Long, lastUs: Long, nEvents: Long, nClicks: Long)

/** A closed session — emitted exactly once, either when a later event
  * for the same user arrives past the gap, or when the event-time
  * watermark passes the session's horizon (user went quiet).
  */
case class UserSession(
    user_id: String,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    n_clicks: Long,
    duration_sec: Double)

/** Event-time sessionization with custom state —
  * `flatMapGroupsWithState`, the operator Structured Streaming
  * provides for state machines that windowed aggregation can't
  * express (a session's extent is data-dependent: each event extends
  * it, so no fixed window holds it).
  *
  * Scale design (SURVEY §2.6 T2 discipline, unbounded stream):
  *  - State is keyed by user and lives in the partitioned state store
  *    — one shuffle on user_id per micro-batch, each of 1000 executors
  *    owns its key range, no global coordination.
  *  - `EventTimeTimeout` + the watermark EVICT state for quiet users:
  *    state size is bounded by users active within gap + lateness, not
  *    by users ever seen — the property that survives 100 TB streams.
  *  - Sessions close deterministically at event time (arrival order
  *    within a batch is sorted before folding), so replaying the same
  *    events yields the same sessions — the streaming ≡ batch property
  *    [[graft.operators.Advanced.sessionize]] pins for the batch form
  *    (same gap rule, expressed as lag/cumsum windows there).
  */
object Sessionize {

  /** Streaming sessions from a parsed events stream (columns
    * `timestamp`, `user_id`, `event_type` — [[EventCodec.parse]]'s
    * shape). Emits one row per CLOSED session, append mode.
    */
  def sessions(
      events: DataFrame,
      gap: String = "30 seconds",
      lateness: String = "1 minute"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
      .microseconds
    events
      .withWatermark("timestamp", lateness)
      .selectExpr("user_id", "timestamp", "event_type")
      .as[(String, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(gapUs))
  }

  private def toSession(uid: String, s: SessionState): UserSession =
    UserSession(
      uid,
      new Timestamp(s.startUs / 1000),
      new Timestamp(s.lastUs / 1000),
      s.nEvents, s.nClicks,
      (s.lastUs - s.startUs) / 1e6)

  private def fold(gapUs: Long)(
      uid: String,
      values: Iterator[(String, Timestamp, String)],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    if (values.isEmpty) {
      // Watermark passed lastUs + gap: the user went quiet — close.
      val out = state.getOption.map(toSession(uid, _))
      state.remove()
      out.iterator
    } else {
      var closed = List.empty[UserSession]
      var st = state.getOption
      // Event-time order, not arrival order: determinism within a batch.
      values.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, typ) =>
        val us = ts.getTime * 1000
        val click = if (typ == "CLICK") 1L else 0L
        st = st match {
          case Some(s) if us <= s.lastUs + gapUs =>
            Some(SessionState(math.min(s.startUs, us), math.max(s.lastUs, us),
              s.nEvents + 1, s.nClicks + click))
          case Some(s) =>
            closed ::= toSession(uid, s)
            Some(SessionState(us, us, 1, click))
          case None =>
            Some(SessionState(us, us, 1, click))
        }
      }
      state.update(st.get)
      // Close via timeout once the watermark passes the gap horizon.
      // (The timestamp must sit above the current watermark, or the
      // state store rejects it — a very late burst could otherwise
      // compute a horizon already under water.)
      state.setTimeoutTimestamp(
        math.max(st.get.lastUs / 1000 + gapUs / 1000,
          state.getCurrentWatermarkMs + 1))
      closed.reverse.iterator
    }
  }

  def start(
      events: DataFrame,
      queryName: String,
      gap: String = "30 seconds",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      sessions(events, gap, lateness)
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}
