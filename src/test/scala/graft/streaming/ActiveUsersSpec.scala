package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stream-vs-batch equivalence of the continuously-maintained
  * event-analytics twins: the streaming rolling-DAU aggregation and
  * the streaming retention machine must converge to exactly the rows
  * the batch operators ([[graft.operators.EventAnalytics]]) compute
  * on the same event set — plus the streaming-only contracts
  * (first-time-only contributions, horizon cut, post-eviction
  * re-anchoring).
  */
class ActiveUsersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"click"}"""

  /** The same events as (ts, user) pairs for the batch side and JSON
    * frames for the stream side, in event-time order (the stream
    * installments must not fall behind the watermark an earlier
    * installment advanced). Activity spans 9 days — inside the 13-day
    * retention horizon, so batch and stream must agree exactly.
    */
  private val fixture: Seq[(String, String)] = Seq(
    ("2024-03-01T08:00:00.000000", "u1"),
    ("2024-03-01T09:30:00.000000", "u1"), // same-day repeat: no new row
    ("2024-03-01T11:00:00.000000", "u2"),
    ("2024-03-02T10:00:00.000000", "u1"),
    ("2024-03-03T12:00:00.000000", "u3"), // later cohort (Mar 3)
    ("2024-03-04T12:00:00.000000", "u3"),
    ("2024-03-05T07:00:00.000000", "u2"), // offset 4
    ("2024-03-09T23:59:59.000000", "u1")) // offset 8

  private def writeBatchFixture(): String = {
    val dir = TestSpark.tmpDir("activeusers")
    fixture.map { case (ts, uid) =>
      (java.sql.Timestamp.valueOf(ts.replace('T', ' ')), uid, "click", 1.0)
    }.toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("streaming rolling DAU converges to the batch operator's rows") {
    val dir = writeBatchFixture()
    val batch = graft.operators.EventAnalytics.rollingDau(spark, dir)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = ActiveUsers.startRollingDau(
      EventCodec.parse(input.toDF()), "dau_stream")
    try {
      // two installments so updates actually refresh existing days
      val (first, second) = fixture.splitAt(4)
      input.addData(first.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      input.addData(second.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      val streamed = spark.table("dau_stream").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming retention converges to the batch triangle; contributions are once-only") {
    val dir = writeBatchFixture()
    val batch = graft.operators.EventAnalytics.retention(spark, dir)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = ActiveUsers.startRetention(
      EventCodec.parse(input.toDF()), "retention_stream")
    try {
      val (first, second) = fixture.splitAt(4)
      input.addData(first.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      // redeliver the newest first-installment event (inside the
      // watermark): the emittedMask must keep its offset once-only;
      // older redeliveries would be watermark-filtered before the
      // machine — the two-layer duplicate protection
      input.addData(Seq(ev(first.last._1, first.last._2)))
      q.processAllAvailable()
      input.addData(second.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      val streamed = spark.table("retention_stream").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming growth view equals the batch user-growth curve") {
    val dir = writeBatchFixture()
    val batch = graft.operators.EventAnalytics.userGrowth(spark, dir)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = ActiveUsers.startRetention(
      EventCodec.parse(input.toDF()), "growth_retention_stream")
    try {
      val (first, second) = fixture.splitAt(4)
      input.addData(first.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      input.addData(second.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      val streamed = ActiveUsers
        .growthView(spark, "growth_retention_stream").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming anomaly view equals the batch 2-sigma flags on the same events") {
    val dir = writeBatchFixture()
    val batch = graft.operators.EventAnalytics.anomaly(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getBoolean(3)))
      .toSet

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = ActiveUsers.startDailyVolume(
      EventCodec.parse(input.toDF()), "volume_stream")
    try {
      val (first, second) = fixture.splitAt(4)
      input.addData(first.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      input.addData(second.map { case (ts, uid) => ev(ts, uid) })
      q.processAllAvailable()
      val streamed = ActiveUsers.anomalyView(spark, "volume_stream").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getBoolean(3)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("retention horizon: beyond-horizon activity is cut, eviction re-anchors a returning user") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = ActiveUsers.startRetention(
      EventCodec.parse(input.toDF()), "retention_horizon", horizon = 13)
    try {
      input.addData(Seq(ev("2024-03-01T08:00:00.000000", "ux")))
      q.processAllAvailable()
      // beyond-horizon activity WITH live state: offset 20 > 13 emits
      // nothing and the old cohort is untouched
      input.addData(Seq(ev("2024-03-21T08:00:00.000000", "ux")))
      q.processAllAvailable()
      // a different user's traffic drives the watermark past ux's
      // eviction horizon; ux has no data this batch, so the event-time
      // timeout fires and removes its state
      input.addData(Seq(ev("2024-03-21T09:00:00.000000", "uy")))
      q.processAllAvailable()
      // post-eviction return: ux re-anchors as a fresh cohort
      // (documented re-acquisition semantics; batch keeps the global
      // first-touch cohort and would have dropped the far event)
      input.addData(Seq(ev("2024-03-22T08:00:00.000000", "ux")))
      q.processAllAvailable()
      val rows = spark.table("retention_horizon").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .toSet
      // old cohort keeps only offset 0; no beyond-horizon row anywhere
      assert(rows.contains(("2024-03-01 00:00:00.0", 0L, 1L)))
      assert(!rows.exists(_._2 > 13L))
      assert(rows.contains(("2024-03-22 00:00:00.0", 0L, 1L)))
    } finally q.stop()
  }
}
