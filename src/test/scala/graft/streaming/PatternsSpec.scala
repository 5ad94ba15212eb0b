package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pattern-level end-to-end tests (SURVEY.md §5.3): replay JSON event
  * messages through a MemoryStream source in multiple micro-batches
  * and assert the maintained summary equals the batch ground truth
  * computed from the same messages — the streaming ≡ batch-recompute
  * property that defines all four patterns.
  */
class PatternsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(ts: String, uid: String, name: String, typ: String): String =
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$name","event_type":"$typ"}"""

  private val batch1 = Seq(
    ev("2024-01-01T00:00:01.000000", "u1", "Alice", "CLICK"),
    ev("2024-01-01T00:00:02.000000", "u1", "Alice", "CLICK"),
    ev("2024-01-01T00:00:03.000000", "u2", "Bob", "CLICK"),
    ev("2024-01-01T00:00:04.000000", "u2", "Bob", "IMPRESSION"),
    ev("2024-01-01T00:00:05.000000", "u3", "Cara", "HOVER_MOUSE"))

  private val batch2 = Seq(
    ev("2024-01-01T00:01:01.000000", "u2", "Bob", "CLICK"),
    ev("2024-01-01T00:01:02.000000", "u3", "Cara", "CLICK"),
    // late arrival: event-time BEFORE batch1's max — the reference's
    // pattern 1.1 would drop this (SURVEY T6); our engine counts it
    ev("2024-01-01T00:00:00.500000", "u1", "Alice", "CLICK"),
    // poison messages: malformed JSON / missing fields are skipped
    // (reference per-message try/except, pattern_1_1.py:64-76)
    """not a json message""",
    """{"user_id":"u9","event_type":"CLICK"}""")

  /** Batch ground truth over the exact same wire messages. */
  private def groundTruth(messages: Seq[String]): Set[(String, String, Long, String)] =
    summarySet(Patterns.clickSummary(
      EventCodec.parse(messages.toDF("value"))))

  private def summarySet(df: DataFrame): Set[(String, String, Long, String)] =
    df.select("user_id", "user_name", "count_of_clicks", "updated_at")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getTimestamp(3).toString))
      .toSet

  test("pattern 1.1: update-mode stateful aggregation maintains the summary across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p11-store"))
    val q = Pattern11.start(EventCodec.parse(input.toDF()), store, TestSpark.tmpDir("p11-ckpt"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      assert(summarySet(store.read().get) === groundTruth(batch1 ++ batch2))
    } finally q.stop()
  }

  test("pattern 1.1: late events update their key (documented deviation from reference drop)") {
    val truth = groundTruth(batch1 ++ batch2)
    // u1's count includes the late 00:00:00.5 click => 3 clicks
    assert(truth.exists(t => t._1 == "u1" && t._3 == 3L))
  }

  test("pattern 1.2: batch-id change feed + delta merge") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p12-store"))
    val rawLog = TestSpark.tmpDir("p12-rawlog") + "/log"
    val q = Pattern12.start(EventCodec.parse(input.toDF()), rawLog, store, TestSpark.tmpDir("p12-ckpt"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()

      val summary = store.read().get
      assert(summarySet(summary) === groundTruth(batch1 ++ batch2))

      // snapshot bookkeeping: last_snapshot stamps the latest batch id
      val snaps = Pattern12.snapshots(spark, rawLog).collect().map(_.getInt(0)).sorted
      assert(snaps.length === 2)
      val maxSnap = snaps.max.toLong
      assert(summary.select("last_snapshot").distinct().collect().map(_.getLong(0)).max === maxSnap)

      // table_changes(from, to] returns exactly the second batch's parsed rows
      val changes = Pattern12.tableChanges(spark, rawLog, snaps.min.toLong, maxSnap)
      assert(changes.count() === 3) // 5 messages - 2 poison
    } finally q.stop()
  }

  test("pattern 1.2 change feed: a replayed batch rewrites its partition, never double-counts") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p12r-store"))
    val rawLog = TestSpark.tmpDir("p12r-rawlog") + "/log"
    val q = Pattern12.start(EventCodec.parse(input.toDF()), rawLog, store, TestSpark.tmpDir("p12r-ckpt"))
    val maxSnap =
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        Pattern12.snapshots(spark, rawLog).collect().map(_.getInt(0)).max.toLong
      } finally q.stop()
    val before = Pattern12.tableChanges(spark, rawLog, maxSnap - 1, maxSnap).count()
    val total = spark.read.parquet(rawLog).count()
    // simulate a foreachBatch crash-retry of batch `maxSnap`: the exact
    // same stamped rows are written again through the same sink path
    val replay = EventCodec.parse(batch2.toDF("value"))
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(maxSnap))
    Pattern12.writeChangeFeed(replay, rawLog)
    // the change feed is unchanged: the partition was rewritten, not re-appended
    assert(Pattern12.tableChanges(spark, rawLog, maxSnap - 1, maxSnap).count() === before)
    assert(spark.read.parquet(rawLog).count() === total)
  }

  test("pattern 2: complete-mode recompute with atomic overwrite") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p2-store"))
    val q = Pattern2.start(EventCodec.parse(input.toDF()), store, TestSpark.tmpDir("p2-ckpt"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      assert(summarySet(store.read().get) === groundTruth(batch1 ++ batch2))
    } finally q.stop()
  }

  test("pattern 2 staging variant: partial aggregates re-aggregate to the same truth") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p2s-store"))
    val q = Pattern2.startWithStaging(
      EventCodec.parse(input.toDF()), TestSpark.tmpDir("p2s-staging") + "/st",
      store, TestSpark.tmpDir("p2s-ckpt"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      assert(summarySet(store.read().get) === groundTruth(batch1 ++ batch2))
    } finally q.stop()
  }

  test("bonus pattern: stateless views recompute on every registration/query") {
    BonusPattern.registerViews(spark, batch1.toDF("message"))
    val top1 = BonusPattern.topUsers(spark, 5).collect()
    assert(top1.map(_.getString(0)).toSeq === Seq("u1", "u2")) // 2 clicks, 1 click
    // "topic" grows; re-register (per-poll re-scan) and the view reflects it
    BonusPattern.registerViews(spark, (batch1 ++ batch2).toDF("message"))
    val top2 = BonusPattern.topUsers(spark, 5).collect()
    assert(top2.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("u1", 3L), ("u2", 2L), ("u3", 1L)))
  }

  test("bonus streaming top-K converges to the polled view's rows per installment") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = BonusPattern.startTopK(
      EventCodec.parse(input.toDF()), "bonus_topk_stream", n = 5)
    def sinkRows(): Seq[(String, Long)] =
      spark.table("bonus_topk_stream")
        .orderBy($"count_of_clicks".desc, $"user_id".asc).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSeq
    try {
      input.addData(batch1); q.processAllAvailable()
      assert(sinkRows() === Seq(("u1", 2L), ("u2", 1L)))
      input.addData(batch2); q.processAllAvailable()
      // the stateful top-K absorbs the late row the poll form would
      // also count (full re-scan) — identical totals both ways
      BonusPattern.registerViews(spark, (batch1 ++ batch2).toDF("message"))
      val polled = BonusPattern.topUsers(spark, 5).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSeq
      assert(sinkRows() === polled)
    } finally q.stop()
  }

  test("stream-static enrichment: fixed dim joins broadcast, left-outer keeps unmatched") {
    implicit val ctx = spark.sqlContext
    val dim = Seq(("u1", "gold"), ("u2", "silver")).toDF("user_id", "tier")
    val input = MemoryStream[String]
    val q = Enrich.start(EventCodec.parse(input.toDF()), dim, "enrich_sink")
    try {
      input.addData(batch1); q.processAllAvailable()
      // u1/u2 enriched, u3 kept with null tier — degraded mode
      val rows = spark.table("enrich_sink").collect()
        .map(r => (r.getString(0), Option(r.getAs[String]("tier")).getOrElse("∅")))
        .toSet
      assert(rows === Set(("u1", "gold"), ("u2", "silver"), ("u3", "∅")))
    } finally q.stop()
  }

  test("refreshable enrichment: per-batch dim re-read picks up a warehouse overwrite") {
    implicit val ctx = spark.sqlContext
    val dimDir = graft.TestSpark.tmpDir("enrich-dim")
    val outDir = graft.TestSpark.tmpDir("enrich-out")
    val ckpt = graft.TestSpark.tmpDir("enrich-ckpt")
    Seq(("u1", "gold"), ("u2", "silver")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val input = MemoryStream[String]
    val q = Enrich.startRefreshable(
      EventCodec.parse(input.toDF()), dimDir, outDir, ckpt)
    try {
      input.addData(batch1); q.processAllAvailable()
      val v1 = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[String]("user_id"),
          Option(r.getAs[String]("tier")).getOrElse("∅"))).toSet
      assert(v1 === Set(("u1", "gold"), ("u2", "silver"), ("u3", "∅")))
      // warehouse refresh between triggers: u3 gains a profile, u1 is
      // re-tiered; the SAME running query resolves v2 on the next batch
      Seq(("u1", "platinum"), ("u2", "silver"), ("u3", "bronze"))
        .toDF("user_id", "tier").write.mode("overwrite").parquet(dimDir)
      input.addData(batch2); q.processAllAvailable()
      val v2 = spark.read.parquet(outDir).collect()
        .filter(_.getAs[java.sql.Timestamp]("timestamp").getTime >=
          java.sql.Timestamp.valueOf("2024-01-01 00:01:00").getTime)
        .map(r => (r.getAs[String]("user_id"), r.getAs[String]("tier"))).toSet
      assert(v2 === Set(("u2", "silver"), ("u3", "bronze")))
    } finally q.stop()
  }

  test("pattern 1.1 strict mode reproduces the reference's late-drop quirk (T6)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("p11s-store"))
    val q = Pattern11.startStrict(EventCodec.parse(input.toDF()), store,
      TestSpark.tmpDir("p11s-ckpt"))
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val summary = summarySet(store.read().get)
      // the late 00:00:00.5 click is at/before the stored watermark
      // (u1's updated_at from batch1) and fails the delta predicate —
      // silently dropped, exactly reference pattern_1_1.py:105. The
      // default Pattern11.start counts it (first test: u1 -> 3).
      assert(summary.find(_._1 == "u1").get._3 === 2L)
      // on-time rows in batch2 still merge normally
      assert(summary.find(_._1 == "u3").get._3 === 1L)
    } finally q.stop()
  }

  test("compaction rewrites the raw log into fewer files, same rows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("cmp-store"))
    val rawLog = TestSpark.tmpDir("cmp-rawlog") + "/log"
    val q = Pattern12.start(EventCodec.parse(input.toDF()), rawLog, store, TestSpark.tmpDir("cmp-ckpt"))
    try {
      batch1.foreach { m => input.addData(m); q.processAllAvailable() } // 1 tiny file-batch per message
    } finally q.stop()
    val rowsBefore = spark.read.parquet(rawLog).count()
    val filesBefore = graft.sinks.Compaction.compact(spark, rawLog, numFiles = 1)
    assert(filesBefore >= 5)
    assert(spark.read.parquet(rawLog).count() === rowsBefore)
  }

  test("windowed aggregation: watermark finalizes windows and drops too-late events") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = WindowedAgg.start(EventCodec.parse(input.toDF()), "win_out")
    try {
      // two events in the 00:00 window, one in 00:01
      input.addData(
        ev("2024-01-01T00:00:10.000000", "u1", "Alice", "CLICK"),
        ev("2024-01-01T00:00:40.000000", "u2", "Bob", "CLICK"),
        ev("2024-01-01T00:01:10.000000", "u1", "Alice", "CLICK"))
      q.processAllAvailable()
      // advance event time past 00:00-window-end (00:01) + 1m lateness
      // => the 00:00 window finalizes and is emitted
      input.addData(ev("2024-01-01T00:03:00.000000", "u3", "Cara", "CLICK"))
      q.processAllAvailable()
      // this event is 2+ minutes behind the watermark: dropped, and the
      // finalized 00:00 window must NOT change
      input.addData(ev("2024-01-01T00:00:50.000000", "u9", "Zoe", "CLICK"))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(out.contains(("2024-01-01 00:00:00.0", "CLICK", 2L)))
      assert(!out.exists { case (w, _, n) => w.startsWith("2024-01-01 00:00:00") && n != 2L })
    } finally q.stop()
  }

  test("sliding windows: each event lands in every overlapping window, all finalize") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    // 1-minute windows sliding every 30 s: an event at :45 belongs to
    // the [:00, :01) and [:00:30, :01:30) windows
    val q = WindowedAgg.start(EventCodec.parse(input.toDF()), "slide_out",
      slide = Some("30 seconds"))
    try {
      input.addData(
        ev("2024-01-01T00:00:45.000000", "u1", "Alice", "CLICK"),
        ev("2024-01-01T00:00:50.000000", "u2", "Bob", "CLICK"))
      q.processAllAvailable()
      // push the watermark past both windows' ends + lateness
      input.addData(ev("2024-01-01T00:05:00.000000", "u3", "Cara", "CLICK"))
      q.processAllAvailable()
      val out = spark.table("slide_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      assert(out.contains(("2024-01-01 00:00:00.0", 2L)))
      assert(out.contains(("2024-01-01 00:00:30.0", 2L)))
      // no phantom third window for the :45/:50 events
      assert(!out.exists { case (w, _) => w.startsWith("2024-01-01 00:01:") })
    } finally q.stop()
  }

  test("trending top-K: late-within-watermark events revise a window's ranking") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("trend-store"))
    val q = Trending.start(EventCodec.parse(input.toDF()), store,
      TestSpark.tmpDir("trend-ckpt"))
    try {
      // 00:00 window: CLICK x2, VIEW x1 → CLICK leads
      input.addData(
        ev("2024-01-01T00:00:10.000000", "u1", "Alice", "CLICK"),
        ev("2024-01-01T00:00:20.000000", "u2", "Bob", "CLICK"),
        ev("2024-01-01T00:00:30.000000", "u3", "Cara", "VIEW"))
      q.processAllAvailable()
      val first = Trending.topK(store).get.collect()
        .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      assert(first.contains(("CLICK", 2L, 1)))
      // two LATE but within-watermark VIEWs flip the 00:00 ranking —
      // the revision append mode could never emit
      input.addData(
        ev("2024-01-01T00:00:40.000000", "u4", "Dan", "VIEW"),
        ev("2024-01-01T00:00:50.000000", "u5", "Eve", "VIEW"))
      q.processAllAvailable()
      val out = Trending.topK(store).get.collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
      assert(out.contains(("2024-01-01 00:00:00.0", "VIEW", 3L, 1)))
      assert(out.contains(("2024-01-01 00:00:00.0", "CLICK", 2L, 2)))
    } finally q.stop()
  }

  test("streaming dedup: replayed messages are dropped, state evicted by watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingDedup.start(EventCodec.parse(input.toDF()), "dedup_out")
    try {
      val dup = ev("2024-01-01T00:00:01.000000", "u1", "Alice", "CLICK")
      input.addData(dup, dup, ev("2024-01-01T00:00:02.000000", "u2", "Bob", "CLICK"))
      q.processAllAvailable()
      input.addData(dup) // replay in a later batch: still within watermark → dropped
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("pattern 2 recovers from its checkpoint: restart resumes, no loss or double count") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val ckpt = TestSpark.tmpDir("rec-ckpt")
    val store = new VersionedStore(spark, TestSpark.tmpDir("rec-store"))
    val q1 = Pattern2.start(EventCodec.parse(input.toDF()), store, ckpt)
    input.addData(batch1); q1.processAllAvailable()
    q1.stop() // crash/redeploy
    val q2 = Pattern2.start(EventCodec.parse(input.toDF()), store, ckpt)
    try {
      input.addData(batch2); q2.processAllAvailable()
      assert(summarySet(store.read().get) === groundTruth(batch1 ++ batch2))
    } finally q2.stop()
  }

  test("versioned store: retried commit is idempotent (bases on the prior snapshot)") {
    val store = new VersionedStore(spark, TestSpark.tmpDir("vs"))
    def applyBatch1(cur: Option[DataFrame]): DataFrame =
      cur.get.unionByName(Seq(("b", 2L)).toDF("k", "v"))
    store.transact(0)(_ => Seq(("a", 1L)).toDF("k", "v"))
    store.transact(1)(applyBatch1)
    assert(store.read().get.count() === 2)
    // streaming replay of batch 1 after a crash-after-commit: the same
    // delta is re-applied, but against v0 — no double counting
    store.transact(1)(applyBatch1)
    assert(store.currentVersion === Some(1L))
    assert(store.read().get.count() === 2)
  }

  test("versioned store: time travel + row-level diff across retained snapshots") {
    val store = new VersionedStore(spark, TestSpark.tmpDir("vstt"), keepVersions = 5)
    store.transact(0)(_ => Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    // v1: b updated (2→20), c inserted, a kept
    store.transact(1)(_ => Seq(("a", 1L), ("b", 20L), ("c", 3L)).toDF("k", "v"))
    assert(store.versions === Seq(0L, 1L))
    assert(store.readAt(0).count() === 2)
    assert(store.readAt(1).count() === 3)
    val changes = store.diff(0, 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // the update appears as delete(old)+insert(new); the insert alone
    assert(changes === Set(
      ("b", 2L, "delete"), ("b", 20L, "insert"), ("c", 3L, "insert")))
    // reading a pruned/never-committed version fails loudly
    intercept[IllegalArgumentException](store.readAt(9))
  }
}
