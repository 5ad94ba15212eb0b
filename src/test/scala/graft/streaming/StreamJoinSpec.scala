package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stream-stream interval join: in-window pairs match (including
  * across micro-batches — the buffered-state path), out-of-window and
  * cross-user pairs don't.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String, typ: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"$typ"}"""

  test("attribution joins purchases to in-window clicks across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamJoin.start(EventCodec.parse(input.toDF()), "attribution_out",
      attributionWindow = "1 minute", lateness = "1 minute")
    try {
      // batch 1: clicks only — they must be BUFFERED, not dropped
      input.addData(Seq(
        ev("2024-01-01T00:00:10.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:20.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:15.000000", "u2", "CLICK")))
      q.processAllAvailable()
      // batch 2: u1 purchase 30 s after its clicks (both in window);
      // u3 purchase with no click; u2's click belongs to another user
      input.addData(Seq(
        ev("2024-01-01T00:00:50.000000", "u1", "PURCHASE"),
        ev("2024-01-01T00:00:55.000000", "u3", "PURCHASE")))
      q.processAllAvailable()

      val rows = spark.table("attribution_out")
        .select("user_id", "purchase_ts", "click_ts", "lag_us")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
        .toSet
      assert(rows === Set(
        ("u1", "2024-01-01 00:00:50.0", "2024-01-01 00:00:10.0", 40000000L),
        ("u1", "2024-01-01 00:00:50.0", "2024-01-01 00:00:20.0", 30000000L)))

      // batch 3: a purchase 10 min later — every earlier click is
      // outside its window; the only candidate pair must NOT match
      input.addData(Seq(ev("2024-01-01T00:10:00.000000", "u1", "PURCHASE")))
      q.processAllAvailable()
      assert(spark.table("attribution_out").count() === 2)
    } finally q.stop()
  }

  test("left-outer attribution emits unmatched purchases with null click_ts after the watermark proves no match") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamJoin.start(EventCodec.parse(input.toDF()), "attribution_outer_out",
      attributionWindow = "1 minute", lateness = "1 minute", outer = true)
    try {
      // batch 1: clicks, buffered
      input.addData(Seq(
        ev("2024-01-01T00:00:10.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:20.000000", "u1", "CLICK")))
      q.processAllAvailable()
      // batch 2: u1 purchase matches both clicks; u3 purchase has no
      // click — it must NOT emit null yet (a qualifying click could
      // still arrive within lateness)
      input.addData(Seq(
        ev("2024-01-01T00:00:50.000000", "u1", "PURCHASE"),
        ev("2024-01-01T00:00:55.000000", "u3", "PURCHASE")))
      q.processAllAvailable()
      val early = spark.table("attribution_outer_out")
        .filter("click_ts IS NULL").count()
      assert(early === 0, "null row emitted before the watermark proved no-match")

      // batch 3: events 5 min later on BOTH sides push the global
      // watermark to 00:04:00 — past u3's window end + lateness — so
      // exactly one null row for u3 emits; the 00:05:00 purchase
      // itself stays buffered (its own no-match point is unproven)
      input.addData(Seq(
        ev("2024-01-01T00:05:00.000000", "u8", "CLICK"),
        ev("2024-01-01T00:05:00.000000", "u9", "PURCHASE")))
      q.processAllAvailable()

      val rows = spark.table("attribution_outer_out")
        .select("user_id", "purchase_ts", "click_ts", "lag_us")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          if (r.isNullAt(2)) null else r.getTimestamp(2).toString,
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSet
      assert(rows === Set(
        ("u1", "2024-01-01 00:00:50.0", "2024-01-01 00:00:10.0", 40000000L),
        ("u1", "2024-01-01 00:00:50.0", "2024-01-01 00:00:20.0", 30000000L),
        ("u3", "2024-01-01 00:00:55.0", null, -1L)))
    } finally q.stop()
  }

  test("keyless banded join pairs purchases with anyone's clicks in ±300 s, boundary inclusive, across bucket edges") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamJoin.startTimeBand(EventCodec.parse(input.toDF()),
      "timeband_out", lateness = "1 minute")
    try {
      // Purchase at 00:09:00 (bucket 1 for a 300 s band). Clicks by
      // OTHER users at the exact boundaries and across bucket edges:
      //  c1 00:04:00.000000  = −300 s exactly, bucket 0  → in (inclusive)
      //  c2 00:03:59.999999  = −300.000001 s, bucket 0   → out by 1 µs
      //  c3 00:14:00.000000  = +300 s exactly, bucket 2  → in (inclusive)
      //  c4 00:14:00.000001  = +300.000001 s, bucket 2   → out by 1 µs
      //  c5 00:09:30.000000  = +30 s, SAME bucket 1      → in
      //  c6 00:09:10.000000  purchase's OWN user         → in (keyless)
      input.addData(Seq(
        ev("2024-01-01T00:04:00.000000", "c1", "CLICK"),
        ev("2024-01-01T00:03:59.999999", "c2", "CLICK"),
        ev("2024-01-01T00:14:00.000000", "c3", "CLICK"),
        ev("2024-01-01T00:14:00.000001", "c4", "CLICK"),
        ev("2024-01-01T00:09:30.000000", "c5", "CLICK"),
        ev("2024-01-01T00:09:10.000000", "p1", "CLICK")))
      q.processAllAvailable()
      input.addData(Seq(ev("2024-01-01T00:09:00.000000", "p1", "PURCHASE")))
      q.processAllAvailable()

      val rows = spark.table("timeband_out")
        .select("user_id", "ctx_user", "delta_us")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(rows === Set(
        ("p1", "c1", -300000000L),
        ("p1", "c3", 300000000L),
        ("p1", "c5", 30000000L),
        ("p1", "p1", 10000000L)))
    } finally q.stop()
  }
}
