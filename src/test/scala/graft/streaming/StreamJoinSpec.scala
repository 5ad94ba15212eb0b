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
}
