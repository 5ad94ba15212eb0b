package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Pattern-level e2e on the REAL driver test data via the file
  * streaming source (SURVEY §5.3): replay `events.parquet` as a
  * parquet-directory stream, run Pattern 2 end-to-end, and assert the
  * maintained summary equals the batch recompute of the same rows —
  * with a second source type (files) complementing the MemoryStream
  * suites.
  */
class FileReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** testdata events → the reference's Event shape. */
  private def shaped(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("ts").as("timestamp"),
      col("user_id").cast("string").as("user_id"),
      concat(lit("user_"), col("user_id")).as("user_name"),
      col("event_type"))

  test("pattern 2 over a file-replayed event stream equals batch recompute") {
    // stage the shaped events as a streamable directory (multiple files
    // = multiple micro-batches with maxFilesPerTrigger)
    val stageDir = TestSpark.tmpDir("replay") + "/events"
    shaped(Tables.events(spark, sf)).repartition(4)
      .write.parquet(stageDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(stageDir).schema)
      .option("maxFilesPerTrigger", "1") // 4 micro-batches
      .parquet(stageDir)

    val store = new VersionedStore(spark, TestSpark.tmpDir("replay-store"))
    val q = Pattern2.start(stream, store, TestSpark.tmpDir("replay-ckpt"),
      clickType = "click")
    try q.processAllAvailable() finally q.stop()

    val got = store.read().get
      .select("user_id", "count_of_clicks", "updated_at")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2))).toSet
    val expected = Patterns.clickSummary(shaped(Tables.events(spark, sf)), "click")
      .select("user_id", "count_of_clicks", "updated_at")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("pattern 2 sustains the reference's producer envelope: >=100 ev/s at the 5s cadence") {
    // BASELINE.md's one functional number: the reference producer emits
    // ~100 ev/s and every pattern keeps up at a 5 s trigger — i.e. a
    // 5 s batch of ~500 events must finish well inside its cadence
    // budget. Replay 10k real events (= 100 producer-seconds of
    // traffic) through the full pattern and pin end-to-end throughput.
    val sf01 = "/root/testdata/sf0.01"
    val stageDir = TestSpark.tmpDir("envelope") + "/events"
    shaped(Tables.events(spark, sf01)).repartition(4)
      .write.parquet(stageDir)
    val nEvents = spark.read.parquet(stageDir).count()

    val stream = spark.readStream
      .schema(spark.read.parquet(stageDir).schema)
      .option("maxFilesPerTrigger", "1") // 4 micro-batches, ~2.5k events each
      .parquet(stageDir)
    val store = new VersionedStore(spark, TestSpark.tmpDir("envelope-store"))
    val q = Pattern2.start(stream, store, TestSpark.tmpDir("envelope-ckpt"),
      clickType = "click")
    val t0 = System.nanoTime()
    val progress =
      try { q.processAllAvailable(); q.recentProgress }
      finally q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9

    val evPerSec = nEvents / elapsed
    // Cadence gate on the query's OWN per-batch metrics, not wall clock:
    // wall clock charges one-time costs (source listing, checkpoint
    // init, codegen) and this host's bursty CPU steal to the batch
    // budget. The claim "keeps up at a 5 s trigger" is a steady-state
    // property, so pin the best full micro-batch: ~2.5k events (25
    // producer-seconds of traffic) must clear inside one 5 s interval.
    val batchSecs = progress.toSeq
      .filter(_.numInputRows > 1000)
      .map(_.durationMs.get("triggerExecution").toDouble / 1e3)
    // steady-state gate: the MEDIAN qualifying batch must clear the 5 s
    // cadence — a single lucky batch can't satisfy the claim, and a
    // single noisy-neighbor burst can't fail it
    val median = batchSecs.sorted.drop((batchSecs.size - 1) / 2).headOption
    withClue(
      f"$nEvents events in $elapsed%.1f s = $evPerSec%.0f ev/s; " +
        s"batch seconds = ${batchSecs.map(s => f"$s%.2f").mkString(",")}") {
      assert(evPerSec >= 100.0)
      assert(median.exists(_ < 5.0))
    }
  }
}
