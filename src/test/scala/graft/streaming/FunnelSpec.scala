package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming funnel state machine: stages advance only in order (a
  * click before signup must not count), conversion emits exactly once
  * and immediately, stalled users flush with their partial depth by
  * watermark timeout, and unresolved users are never emitted early.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String, typ: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"$typ"}"""

  test("ordered conversion, max-once emission, timeout flush of partials") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = Funnel.start(EventCodec.parse(input.toDF()),
      "funnel_out", window = "5 minutes", lateness = "1 minute")
    try {
      // u1: pre-signup CLICK (must not count), then the full ordered
      // path — converts at 00:00:40 with lag 30 s from signup.
      // u2: signs up then clicks but never purchases.
      // u3: only clicks — never enters the funnel.
      input.addData(Seq(
        ev("2024-01-01T00:00:05.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:10.000000", "u1", "SIGNUP"),
        ev("2024-01-01T00:00:20.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:40.000000", "u1", "PURCHASE"),
        ev("2024-01-01T00:00:10.000000", "u2", "SIGNUP"),
        ev("2024-01-01T00:00:30.000000", "u2", "CLICK"),
        ev("2024-01-01T00:00:15.000000", "u3", "CLICK")))
      q.processAllAvailable()
      val afterBatch1 = spark.table("funnel_out").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(afterBatch1 === Set(("u1", 3)), "only the conversion emits eagerly")

      // A late PURCHASE for u1 must NOT re-emit (state evicted on
      // conversion); far-future traffic advances the watermark past
      // u2's 00:05:10 horizon → u2 flushes at depth 2.
      input.addData(Seq(
        ev("2024-01-01T00:00:50.000000", "u1", "PURCHASE"),
        ev("2024-01-01T00:10:00.000000", "u9", "SIGNUP")))
      q.processAllAvailable()
      input.addData(Seq(ev("2024-01-01T00:20:00.000000", "u9b", "CLICK")))
      q.processAllAvailable()

      val rows = spark.table("funnel_out")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getTimestamp(2).toString,
          r.getTimestamp(3).toString, r.getDouble(4)))
        .toSet
      assert(rows.count(_._1 == "u1") === 1, "conversion emits exactly once")
      assert(rows.contains(
        ("u1", 3, "2024-01-01 00:00:10.0", "2024-01-01 00:00:40.0", 30.0)))
      assert(rows.contains(
        ("u2", 2, "2024-01-01 00:00:10.0", "2024-01-01 00:00:30.0", 20.0)))
      assert(!rows.exists(_._1 == "u3"), "never-signed-up users never emit")
    } finally q.stop()
  }
}
