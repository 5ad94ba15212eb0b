package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Crafted-fixture semantics pins for the behavioral analytics family:
  * the funnel's sequential-min ordering (a click BEFORE signup must not
  * count), retention day-offsets, and the rolling window's strict
  * 7-day trailing edge. Fixtures are written in the driver's physical
  * layout (ts as int64 nanoseconds — TESTDATA.md) so the same
  * [[graft.Tables.events]] loader path is exercised.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DayNs = 86400L * 1000 * 1000 * 1000

  /** rows: (event_id, ts_ns, user_id, event_type) */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = TestSpark.tmpDir("evfix")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: stage times are sequential mins, pre-signup clicks don't count") {
    val us = 1000L // 1 µs in ns
    val dir = writeEvents(Seq(
      // user 1: click@5 precedes signup@10 → t2 must be the click@20;
      // purchase@15 precedes t2=20 → t3 must be the purchase@30
      (1L, 5L * us, 1L, "click"),
      (2L, 10L * us, 1L, "signup"),
      (3L, 20L * us, 1L, "click"),
      (4L, 15L * us, 1L, "purchase"),
      (5L, 30L * us, 1L, "purchase"),
      // user 2: signup then purchase but never clicks → stops at stage 1
      (6L, 10L * us, 2L, "signup"),
      (7L, 20L * us, 2L, "purchase"),
      // user 3: clicks without ever signing up → not in the funnel
      (8L, 10L * us, 3L, "click")))
    val rows = EventAnalytics.funnel(spark, dir).collect()
    assert(rows.length === 1) // all signups on one day
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_signup")) === 2L)
    assert(r.getLong(r.fieldIndex("n_click_after")) === 1L)
    assert(r.getLong(r.fieldIndex("n_purchase_after")) === 1L)
    assert(r.getLong(r.fieldIndex("sum_click_lag_us")) === 10L)    // 20-10
    assert(r.getLong(r.fieldIndex("sum_purchase_lag_us")) === 10L) // 30-20
  }

  test("retention: offsets are whole days from each user's first event") {
    val dir = writeEvents(Seq(
      // user 1: first touch day 0, active days 0, 1, 3
      (1L, 0L * DayNs + 7, 1L, "view"),
      (2L, 1L * DayNs + 9, 1L, "click"),
      (3L, 3L * DayNs + 1, 1L, "view"),
      (4L, 3L * DayNs + 2, 1L, "click"), // same day twice → one row
      // user 2: first touch day 1, active days 1, 2
      (5L, 1L * DayNs + 5, 2L, "view"),
      (6L, 2L * DayNs + 5, 2L, "view")))
    val got = EventAnalytics.retention(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 86400,
        r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("rolling dau: trailing window is strictly (day-7, day]") {
    val dir = writeEvents(Seq(
      (1L, 0L * DayNs + 1, 1L, "view"), // user 1 on day 0
      (2L, 3L * DayNs + 1, 2L, "view"), // user 2 on day 3
      (3L, 7L * DayNs + 1, 3L, "view"), // user 3 on day 7
      (4L, 7L * DayNs + 2, 2L, "view"))) // user 2 again on day 7
    val got = EventAnalytics.rollingDau(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 86400,
        r.getLong(1), r.getLong(2))).toSet
    // day 7's window is (0, 7]: day 0's user 1 has aged out
    assert(got === Set((0L, 1L, 1L), (3L, 2L, 1L), (7L, 2L, 2L)))
  }

  test("histogram bins partition the events exactly") {
    val sf = "/root/testdata/sf0.001"
    val bins = EventAnalytics.histogram(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(bins.map(_.getLong(1)).sum === total)
    assert(bins.map(_.getLong(0)).distinct.length === bins.length)
  }

  test("attribution: latest in-window click wins, boundary inclusive, ties by id") {
    val us = 1000L // 1 µs in ns
    val win = 30L * 60 * 1000 * 1000 // 30 min in µs
    val dir = writeEvents(Seq(
      // user 1: two clicks before the purchase — the later one (id 2) wins
      (1L, 10L * us, 1L, "click"),
      (2L, 20L * us, 1L, "click"),
      (3L, 30L * us, 1L, "purchase"),
      // user 2: click exactly at the 30-min boundary → still attributed
      (4L, 0L, 2L, "click"),
      (5L, win * 1000L, 2L, "purchase"),
      // user 3: click 1 µs beyond the window → organic
      (6L, 0L, 3L, "click"),
      (7L, (win + 1L) * 1000L, 3L, "purchase"),
      // user 4: two clicks at the SAME microsecond → higher event_id wins
      (8L, 10L * us, 4L, "click"),
      (9L, 10L * us, 4L, "click"),
      (10L, 20L * us, 4L, "purchase"),
      // user 5: purchase with no clicks at all → organic, single row
      (11L, 10L * us, 5L, "purchase")))
    val rows = EventAnalytics.attribution(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("click_event_id"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("lag_us"))).map(_.asInstanceOf[Long])))
      .toMap
    assert(rows.size === 5) // every purchase emits exactly once
    assert(rows(3L) === ((Some(2L), Some(10L))))
    assert(rows(5L) === ((Some(4L), Some(win))))
    assert(rows(7L) === ((None, None)))
    assert(rows(10L) === ((Some(9L), Some(10L))))
    assert(rows(11L) === ((None, None)))
  }

  test("anomaly: planted spike flagged, steady days not") {
    // 9 steady days at 2 events + one 20-event spike day: mean≈3.64,
    // σ²≈29.1 → 2σ≈10.8 — only the spike deviates by more
    val rows = (0 until 9).flatMap { d =>
      Seq((d * 10L + 1L, d * DayNs + 7, 1L, "view"),
        (d * 10L + 2L, d * DayNs + 9, 2L, "view"))
    } ++ (0 until 20).map { i =>
      (900L + i, 9L * DayNs + i * 1000L, i.toLong, "view")
    }
    val dir = writeEvents(rows)
    val out = EventAnalytics.anomaly(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("n")) -> r.getBoolean(r.fieldIndex("is_anomaly")))
    assert(out.length === 10)
    assert(out.filter(_._1 == 2L).forall(!_._2))
    assert(out.find(_._1 == 20L).exists(_._2))
  }
}
