package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source builders, mirroring the reference's consumer configs.
  *
  * These construct the standard Spark Kafka source plans (columns
  * `key`,`value`,`topic`,`partition`,`offset`,`timestamp`,...).
  *
  * HARD PRECONDITION: the `spark-sql-kafka-0-10` package MUST be on
  * the classpath — exactly how the reference ships it
  * (pattern_2.py:22-24 adds it via `--packages`). Without it every
  * builder here throws `Failed to find data source: kafka` at plan
  * time; this environment has no connector jar, and OperatorSpec pins
  * that failure mode. Everything downstream (EventCodec parse, the
  * four patterns) is broker-independent and tested via
  * MemoryStream/file replay (SURVEY.md §7.4 risk 4).
  *
  * Resolution attempt (2026-08-13, re-checked same day in round 5):
  * adding
  * `"org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2" % Test`
  * fails in this offline sandbox — the artifact is absent from both
  * the local ivy tree and the pre-warmed coursier cache (searched
  * `~/.cache/coursier`, `~/.ivy2`, `~/.m2`, `/opt/spark/jars`:
  * zero kafka artifacts; `sbt.librarymanagement.ResolveException:
  * Not found`), so not even a plan-construction test can run here. On any cluster with the
  * connector (or `--packages org.apache.spark:spark-sql-kafka-0-10_
  * 2.13:4.1.2`), `KafkaE2ESpec` exercises these builders end-to-end
  * against a real broker via `SPARK_GRAFT_KAFKA_BROKER`.
  */
object KafkaSource {

  /** Streaming scan of a topic from the earliest offset — the Spark
    * form of the reference's consumer loop (pattern_1_1.py:44-66:
    * `auto.offset.reset=earliest`) and literally pattern_2.py:38-43.
    */
  def stream(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** Whole-topic batch scan (earliest → latest) — the reference's
    * `tributary_scan_topic` relation (bonus_pattern.py:22): the topic
    * exposed as a scannable table, re-read in full on every query.
    * Feed the result (renamed `value` → `message`) to
    * [[graft.streaming.BonusPattern.registerViews]].
    */
  def batchScan(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
      .withColumnRenamed("value", "message")
}
