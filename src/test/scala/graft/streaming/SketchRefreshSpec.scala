package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming HLL register refresh: registers maintained across
  * micro-batches are bit-identical to the batch derivation over the
  * same documents — the max-monoid merge happens live, including a
  * later batch RAISING a register a previous batch set.
  */
class SketchRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed HLL registers equal the batch derivation; later batches raise registers") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = SketchRefresh.start(docs, "hll_regs_test")
    try {
      val b1 = Seq(
        (1L, "fast scan merge sort table window key value", "en", "web", 44L),
        (2L, "query plan join filter group agg", "en", "web", 33L),
        (3L, "stream batch spark row column vector", "en", "books", 37L))
      val b2 = Seq(
        (4L, "fast scan merge sort table window key value", "en", "web", 44L), // dup of doc 1
        (5L, "hash part small big slow data line customer", "en", "books", 44L))
      input.addData(b1)
      q.processAllAvailable()
      val afterB1 = spark.table("hll_regs_test").as[(String, Long, Int)]
        .collect().toSet
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("hll_regs_test").as[(String, Long, Int)]
        .collect().toSet
      val batch = SketchRefresh.registers(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(String, Long, Int)].collect().toSet
      assert(streamed === batch)
      // merge is monotone: every register present after b1 is still
      // present with m' >= m (duplicate doc 4 adds nothing new to web)
      val finalByKey = streamed.map { case (s, j, m) => (s, j) -> m }.toMap
      assert(afterB1.forall { case (s, j, m) => finalByKey((s, j)) >= m })
      // and b2's fresh doc genuinely extended the books registers
      val booksB1 = afterB1.count(_._1 == "books")
      val booksFinal = streamed.count(_._1 == "books")
      assert(booksFinal > booksB1)
    } finally q.stop()
  }

  test("streamed Count-Min counters equal the batch derivation; cells only grow") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = SketchRefresh.startCms(docs, "cms_test")
    try {
      val b1 = Seq(
        (1L, "fast scan merge sort fast fast", "en", "web", 30L),
        (2L, "query plan join filter", "en", "web", 22L))
      val b2 = Seq((3L, "fast query stream batch", "en", "books", 23L))
      input.addData(b1)
      q.processAllAvailable()
      val afterB1 = spark.table("cms_test").as[(Long, Long, Long)]
        .collect().map { case (r, b, c) => (r, b) -> c }.toMap
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("cms_test").as[(Long, Long, Long)]
        .collect().map { case (r, b, c) => (r, b) -> c }.toMap
      val batch = SketchRefresh.cmsCounters(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(Long, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
      assert(streamed === batch)
      // counters are a sum-monoid: no cell ever shrinks
      assert(afterB1.forall { case (k, c) => streamed(k) >= c })
      // total mass = occurrences × depth, conserved across batches
      val tokens = (b1 ++ b2).map(_._2.split(" ").length).sum
      assert(streamed.values.sum === tokens.toLong * 4)
    } finally q.stop()
  }

  test("HLL register state survives a query restart: post-recovery registers equal the batch fold over ALL rows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val ckpt = TestSpark.tmpDir("sketch-ckpt")
    val b1 = Seq(
      (1L, "fast scan merge sort table window key value", "en", "web", 44L),
      (2L, "query plan join filter group agg", "en", "books", 33L))
    val b2 = Seq(
      (3L, "stream batch spark row column vector", "en", "web", 37L))
    val q1 = SketchRefresh.start(docs, "hll_restart_test", checkpoint = Some(ckpt))
    input.addData(b1)
    q1.processAllAvailable()
    q1.stop() // crash/redeploy — registers live in the checkpointed state
    val q2 = SketchRefresh.start(docs, "hll_restart_test", checkpoint = Some(ckpt))
    try {
      input.addData(b2)
      q2.processAllAvailable()
      val streamed = spark.table("hll_restart_test").as[(String, Long, Int)]
        .collect().toSet
      val batch = SketchRefresh.registers(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(String, Long, Int)].collect().toSet
      assert(streamed === batch,
        "recovered registers must equal the batch fold over pre- AND post-restart rows")
    } finally q2.stop()
  }

  test("streamed BM25 corpus stats equal the batch aggregate, across batches and a restart") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val ckpt = TestSpark.tmpDir("bm25-stats-ckpt")
    // terms spark/join/window appear across batches so every df column
    // genuinely accumulates
    val b1 = Seq(
      (1L, "spark join window scan merge", "en", "web", 29L),
      (2L, "filter group agg plan", "en", "web", 22L))
    val b2 = Seq(
      (3L, "spark window vector row", "en", "books", 23L),
      (4L, "join join join", "en", "books", 14L))
    def batchStats(rows: Seq[(Long, String, String, String, Long)]) =
      SketchRefresh.bm25Stats(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(Long, Double, Long, Long, Long)].collect().head
    def streamedStats() = spark.table("bm25_stats_test")
      .as[(Long, Double, Long, Long, Long)].collect().head
    val q1 = SketchRefresh.startBm25Stats(docs, "bm25_stats_test",
      checkpoint = Some(ckpt))
    input.addData(b1)
    q1.processAllAvailable()
    assert(streamedStats() === batchStats(b1))
    q1.stop() // crash/redeploy — the 1-row state lives in the checkpoint
    val q2 = SketchRefresh.startBm25Stats(docs, "bm25_stats_test",
      checkpoint = Some(ckpt))
    try {
      input.addData(b2)
      q2.processAllAvailable()
      val s = streamedStats()
      assert(s === batchStats(b1 ++ b2),
        "recovered stats must equal the batch fold over pre- AND post-restart docs")
      // hand-check the monoid columns: 4 docs, 16 tokens, df(spark)=2,
      // df(join)=2, df(window)=2
      assert(s === ((4L, 16.0, 2L, 2L, 2L)))
    } finally q2.stop()
  }

  test("streamed daily volume feeds the CUSUM tail bit-identically to the batch changepoint") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "event_id")
    val q = SketchRefresh.startDailyVolume(events, "daily_vol_test")
    try {
      def t(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2026-01-$day%02d $h%02d:00:00")
      // day 1: 3 events, day 2: 1, day 3: 6 (split across batches — the
      // sum-monoid merge must combine partial day counts)
      val b1 = Seq((t(1, 1), 1L), (t(1, 2), 2L), (t(2, 3), 3L), (t(3, 1), 4L))
      val b2 = Seq((t(1, 9), 5L), (t(3, 2), 6L), (t(3, 3), 7L), (t(3, 4), 8L),
        (t(3, 5), 9L), (t(3, 6), 10L))
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val maintained = spark.table("daily_vol_test")
      val streamed = graft.operators.EventAnalytics.cusumOf(maintained)
        .as[(java.sql.Timestamp, Long, Long, Long, Boolean)].collect().sortBy(_._1.getTime).toSeq
      val batch = graft.operators.EventAnalytics.cusumOf(
        graft.operators.EventAnalytics.dailyCounts(
          (b1 ++ b2).toDF("ts", "event_id")))
        .as[(java.sql.Timestamp, Long, Long, Long, Boolean)].collect().sortBy(_._1.getTime).toSeq
      assert(streamed === batch)
      assert(streamed.map(_._2) === Seq(3L, 1L, 6L))
    } finally q.stop()
  }

  test("streamed user-cube cell registers equal batch; rollup from the maintained table is valid") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val q = SketchRefresh.startUserCube(events, "user_cube_test")
    try {
      def t(day: Int) = java.sql.Timestamp.valueOf(f"2026-02-$day%02d 09:00:00")
      val b1 = Seq((t(1), 1L, 7L, "click"), (t(1), 2L, 8L, "click"),
        (t(2), 3L, 7L, "view"))
      val b2 = Seq((t(1), 4L, 9L, "click"), (t(2), 5L, 7L, "click"))
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("user_cube_test")
        .as[(String, java.sql.Timestamp, Long, Int)].collect().toSet
      val batch = SketchRefresh.userCellRegisters(
        (b1 ++ b2).toDF("ts", "event_id", "user_id", "event_type"))
        .as[(String, java.sql.Timestamp, Long, Int)].collect().toSet
      assert(streamed === batch)
      // the rollup the batch cube runs works off the MAINTAINED table:
      // per-type registers = per-register max over its cells
      val rolled = spark.table("user_cube_test")
        .groupBy("event_type", "j")
        .agg(org.apache.spark.sql.functions.max("m").as("m"))
        .as[(String, Long, Int)].collect().toSet
      val direct = graft.operators.EventAnalytics.userCellRegisters(
        (b1 ++ b2).toDF("ts", "event_id", "user_id", "event_type"))
        .groupBy("event_type", "j")
        .agg(org.apache.spark.sql.functions.max("m").as("m"))
        .as[(String, Long, Int)].collect().toSet
      assert(rolled === direct)
    } finally q.stop()
  }

  test("streamed MG summary equals batch in the ≤k-distinct regime with an exact total") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = SketchRefresh.startMg(docs, "mg_small_test")
    try {
      // 12 distinct tokens total << k=32: no decrement ever fires, so
      // the streamed summary must be BIT-identical to the batch fold
      val b1 = Seq(
        (1L, "fast scan merge sort fast fast table", "en", "web", 37L),
        (2L, "query plan join filter", "en", "web", 22L))
      val b2 = Seq((3L, "fast query stream batch spark", "en", "books", 29L))
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("mg_small_test")
        .as[(Seq[Long], Long)].collect().toSeq
      val batch = SketchRefresh.mgSummary(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source", "n_chars"))
        .as[(Seq[Long], Long)].collect().toSeq
      assert(streamed === batch)
      val tokens = (b1 ++ b2).map(_._2.split(" ").length).sum.toLong
      assert(streamed.head._2 === tokens)
    } finally q.stop()
  }

  test("MG one-sided guarantee survives state-store merges across batches past the decrement regime") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = SketchRefresh.startMg(docs, "mg_guarantee_test", k = 4)
    try {
      // 17 tokens, "hot" owns 8 > 17/(k+1)=3.4; rare tokens (9 distinct
      // across the two batches, > k) force the decrement path
      input.addData(Seq((1L, "hot hot hot hot hot a b c d", "en", "web", 27L)))
      q.processAllAvailable()
      input.addData(Seq((2L, "hot hot hot e f g h i", "en", "web", 21L)))
      q.processAllAvailable()
      val (cand, total) = spark.table("mg_guarantee_test")
        .as[(Seq[Long], Long)].collect().head
      val hotHash = spark.range(1)
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit("hot")))
        .as[Long].collect().head
      assert(total === 17L)
      assert(cand.size <= 4)
      assert(cand.contains(hotHash),
        "a key above 1/(k+1) of all mass seen must be present")
      assert(cand === cand.sorted)
    } finally q.stop()
  }
}
