package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Flag-gated broker end-to-end harness — the analogue of the
  * reference's docker-compose run (docker-compose.yml:3-23: single
  * KRaft broker; scripts/producer.py feeding `user_events`).
  *
  * The sandbox has neither a broker nor the `spark-sql-kafka-0-10`
  * connector jar (OperatorSpec pins that failure mode), so these tests
  * CANCEL here via `assume` and run only where a deployment provides
  * both:
  *
  * {{{
  * SPARK_GRAFT_KAFKA_BROKER=localhost:9092 \
  * SPARK_GRAFT_KAFKA_TOPIC=user_events \
  *   sbt "testOnly graft.streaming.KafkaE2ESpec"
  * }}}
  *
  * All pattern SEMANTICS are already covered broker-independently by
  * the MemoryStream/file-replay suites (SURVEY §7.4 risk 4); this
  * harness adds the wire-level leg: real consumer config, real
  * `value` bytes, real offsets.
  */
class KafkaE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val broker = sys.env.get("SPARK_GRAFT_KAFKA_BROKER")
  private val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "user_events")

  private def gated(): String = {
    assume(broker.isDefined,
      "set SPARK_GRAFT_KAFKA_BROKER=host:port (with spark-sql-kafka-0-10 on the classpath) to run")
    broker.get
  }

  test("whole-topic batch scan parses the producer's wire format end-to-end") {
    val b = gated()
    // bonus-pattern leg: topic as a table → stacked views → top-K
    // (reference bonus_pattern.py:17-50 against producer.py traffic)
    val raw = graft.sources.KafkaSource.batchScan(spark, b, topic)
    assert(raw.columns.contains("message"))
    BonusPattern.registerViews(spark, raw, clickType = "CLICK")
    val parsed = spark.table("raw_events_view")
    val n = parsed.count()
    assert(n > 0, s"topic $topic is empty — run the producer first")
    // every surviving row carries the full typed event shape
    assert(parsed.filter(col("timestamp").isNull || col("user_id").isNull).count() === 0)
    assert(BonusPattern.topUsers(spark, 5).count() <= 5)
  }

  test("pattern 2 over the live stream equals the whole-topic batch recompute") {
    val b = gated()
    val store = new VersionedStore(spark, TestSpark.tmpDir("kafka-e2e-store"))
    val stream = EventCodec.parse(
      graft.sources.KafkaSource.stream(spark, b, topic))
    val q = Pattern2.start(stream, store, TestSpark.tmpDir("kafka-e2e-ckpt"),
      clickType = "CLICK")
    try q.processAllAvailable() finally q.stop()
    val got = store.read().get
      .select("user_id", "count_of_clicks")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = Patterns.clickSummary(
      EventCodec.parse(
        graft.sources.KafkaSource.batchScan(spark, b, topic), "message"),
      "CLICK")
      .select("user_id", "count_of_clicks")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
