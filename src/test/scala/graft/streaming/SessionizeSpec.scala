package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Custom-state streaming: sessions close exactly once, either by a
  * later past-gap event (split) or by watermark timeout (quiet user),
  * and an open session is never emitted early.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String, typ: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"$typ"}"""

  test("flatMapGroupsWithState sessionization: gap-split and timeout closes") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = Sessionize.start(EventCodec.parse(input.toDF()),
      "sessions_out", gap = "30 seconds", lateness = "1 minute")
    try {
      // u1: two events 9 s apart (one session); u2: a single event.
      input.addData(Seq(
        ev("2024-01-01T00:00:01.000000", "u1", "CLICK"),
        ev("2024-01-01T00:00:10.000000", "u1", "IMPRESSION"),
        ev("2024-01-01T00:00:05.000000", "u2", "CLICK")))
      q.processAllAvailable()
      // u1 again at 00:02:00 — 110 s past its last event, > 30 s gap:
      // session 1 closes by SPLIT in this batch. Watermark → 00:01:00.
      input.addData(Seq(ev("2024-01-01T00:02:00.000000", "u1", "CLICK")))
      q.processAllAvailable()
      // Unrelated user far in the future: the advanced watermark
      // (00:01:00 entering this batch) is past u2's 00:00:35 horizon —
      // u2 closes by TIMEOUT. u9's own session stays open (the
      // watermark never reaches 00:10:30).
      input.addData(Seq(ev("2024-01-01T00:10:00.000000", "u9", "CLICK")))
      q.processAllAvailable()

      val rows = spark.table("sessions_out")
        .select("user_id", "session_start", "session_end", "n_events",
          "n_clicks", "duration_sec")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toSet
      assert(rows.contains(
        ("u1", "2024-01-01 00:00:01.0", "2024-01-01 00:00:10.0", 2L, 1L, 9.0)))
      assert(rows.contains(
        ("u2", "2024-01-01 00:00:05.0", "2024-01-01 00:00:05.0", 1L, 1L, 0.0)))
      assert(!rows.exists(_._1 == "u9"), "open session must not be emitted")
    } finally q.stop()
  }

  test("sessionization on the RocksDB state backend: same sessions, provider active") {
    implicit val ctx = spark.sqlContext
    StateBackend.withRocksDb(spark) {
      val input = MemoryStream[String]
      val q = Sessionize.start(EventCodec.parse(input.toDF()),
        "sessions_rocksdb", gap = "30 seconds", lateness = "1 minute")
      try {
        input.addData(Seq(
          ev("2024-01-01T00:00:01.000000", "u1", "CLICK"),
          ev("2024-01-01T00:00:10.000000", "u1", "IMPRESSION"),
          ev("2024-01-01T00:00:05.000000", "u2", "CLICK")))
        q.processAllAvailable()
        input.addData(Seq(ev("2024-01-01T00:02:00.000000", "u1", "CLICK")))
        q.processAllAvailable()
        input.addData(Seq(ev("2024-01-01T00:10:00.000000", "u9", "CLICK")))
        q.processAllAvailable()

        // the provider actually in use surfaces through the state
        // operator's custom metrics — HDFS-backed exposes none of these
        val metricKeys = q.lastProgress.stateOperators
          .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb custom metrics, got: ${metricKeys.mkString(", ")}")

        val rows = spark.table("sessions_rocksdb")
          .select("user_id", "session_start", "session_end", "n_events",
            "n_clicks", "duration_sec")
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getLong(3), r.getLong(4), r.getDouble(5)))
          .toSet
        assert(rows.contains(
          ("u1", "2024-01-01 00:00:01.0", "2024-01-01 00:00:10.0", 2L, 1L, 9.0)))
        assert(rows.contains(
          ("u2", "2024-01-01 00:00:05.0", "2024-01-01 00:00:05.0", 1L, 1L, 0.0)))
        assert(!rows.exists(_._1 == "u9"), "open session must not be emitted")
      } finally q.stop()
    }
    // getOption surfaces the key's DEFAULT (the HDFS-backed provider)
    // after unset — restored means "anything but RocksDB"
    assert(!spark.conf.getOption(StateBackend.ProviderKey).contains(StateBackend.RocksDb),
      "withRocksDb must restore the previous backend")
  }

  test("sessionization is deterministic under arrival-order permutation within a batch") {
    implicit val ctx = spark.sqlContext
    // Same events, reversed arrival order inside the batch: the fold
    // sorts by event time, so the emitted session is identical.
    def run(messages: Seq[String], name: String): Set[String] = {
      val input = MemoryStream[String]
      val q = Sessionize.start(EventCodec.parse(input.toDF()), name,
        gap = "30 seconds", lateness = "1 minute")
      try {
        input.addData(messages)
        q.processAllAvailable()
        input.addData(Seq(ev("2024-01-01T01:00:00.000000", "zz", "CLICK")))
        q.processAllAvailable()
        input.addData(Seq(ev("2024-01-01T02:00:00.000000", "zz", "CLICK")))
        q.processAllAvailable()
        spark.table(name).filter($"user_id" === "u1")
          .collect().map(_.toString).toSet
      } finally q.stop()
    }
    val evs = Seq(
      ev("2024-01-01T00:00:01.000000", "u1", "CLICK"),
      ev("2024-01-01T00:00:20.000000", "u1", "CLICK"),
      ev("2024-01-01T00:00:40.000000", "u1", "IMPRESSION"))
    val a = run(evs, "sess_perm_a")
    val b = run(evs.reverse, "sess_perm_b")
    assert(a === b)
    assert(a.nonEmpty)
  }
}
