package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Per-user buffered events not yet provably ordered (above the
  * watermark), plus the last FINALIZED event — the bridge the next
  * finalized event links from. Epoch micros, the [[SessionState]]
  * serialization discipline.
  */
case class TransitionState(
    bridgeUs: Long, bridgeType: String, hasBridge: Boolean,
    buf: List[(Long, String)])

/** One finalized event-type transition in a user's journey. */
case class UserTransition(
    user_id: String,
    from_type: String,
    to_type: String,
    from_ts: Timestamp,
    to_ts: Timestamp)

/** Streaming twin of the batch Markov transition matrix
  * ([[graft.operators.EventAnalytics.markov]]) — consecutive
  * event-type pairs per user, emitted append-only as they become
  * PROVABLE, with the count matrix left to a downstream aggregation
  * (the Pattern 1.2 log-then-aggregate discipline; chaining a second
  * stateful count here would fight the multi-stateful-operator
  * restrictions for no benefit).
  *
  * The watermark-correctness subtlety (and why [[Sessionize]]'s
  * fold-as-you-go isn't enough here): a transition (a → b) is only
  * provable once NO event can still arrive between a and b — i.e.
  * both sit at-or-below the event-time watermark. So events BUFFER in
  * state until the watermark passes them, then sort by event time and
  * link up, with the last finalized event kept as the bridge to the
  * future. Arrival order never matters; replays yield the same pairs.
  *
  * State bounds (the unbounded-stream discipline): the buffer holds
  * only events above the watermark — (ingest rate × lateness) per
  * user — and an idle user's bridge is EVICTED once the watermark
  * passes `idleTtl` past it, so state is bounded by recently-active
  * users. Documented deviation from the batch form: a transition
  * spanning a silence longer than `idleTtl` is not emitted (the batch
  * operator, seeing all history at once, counts it) — the same
  * bounded-state trade [[StreamingDedup]] documents for its horizon.
  */
object Transitions {

  def transitions(
      events: DataFrame,
      lateness: String = "1 minute",
      idleTtl: String = "10 minutes"): Dataset[UserTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleTtl))
      .microseconds
    events
      .withWatermark("timestamp", lateness)
      .selectExpr("user_id", "timestamp", "event_type")
      .as[(String, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(ttlUs))
  }

  private def fold(ttlUs: Long)(
      uid: String,
      values: Iterator[(String, Timestamp, String)],
      state: GroupState[TransitionState]): Iterator[UserTransition] = {
    val st = state.getOption.getOrElse(TransitionState(0L, "", hasBridge = false, Nil))
    val incoming = values.map { case (_, ts, typ) => (ts.getTime * 1000L, typ) }.toList
    val wmUs = state.getCurrentWatermarkMs * 1000L
    // bridge ≤ old watermark ≤ every buffered/incoming event, so the
    // sorted merge below never places anything before it
    val pendingAll = (st.buf ++ incoming).sortBy(e => (e._1, e._2))
    val (ready, stillPending) = pendingAll.partition(_._1 <= wmUs)
    val chain = (if (st.hasBridge) List((st.bridgeUs, st.bridgeType)) else Nil) ++ ready
    val out = chain.sliding(2).collect {
      case List((aUs, aT), (bUs, bT)) =>
        UserTransition(uid, aT, bT, new Timestamp(aUs / 1000), new Timestamp(bUs / 1000))
    }.toList
    val newBridge = ready.lastOption
      .orElse(if (st.hasBridge) Some((st.bridgeUs, st.bridgeType)) else None)
    if (stillPending.isEmpty && newBridge.exists(_._1 + ttlUs <= wmUs)) {
      // idle past the TTL with nothing in flight: evict entirely
      state.remove()
    } else if (stillPending.isEmpty && newBridge.isEmpty) {
      state.remove()
    } else {
      state.update(TransitionState(
        newBridge.map(_._1).getOrElse(0L), newBridge.map(_._2).getOrElse(""),
        newBridge.isDefined, stillPending))
      // wake when the watermark can next finalize something: the
      // earliest pending event, else the bridge's TTL horizon (always
      // strictly above the current watermark, per the state-store rule)
      val targetMs = stillPending.headOption.map(_._1 / 1000L + 1)
        .getOrElse(newBridge.get._1 / 1000L + ttlUs / 1000L)
      state.setTimeoutTimestamp(math.max(targetMs, state.getCurrentWatermarkMs + 1))
    }
    out.iterator
  }

  def start(
      events: DataFrame,
      queryName: String,
      lateness: String = "1 minute",
      idleTtl: String = "10 minutes",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      transitions(events, lateness, idleTtl)
        .toDF()
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}
