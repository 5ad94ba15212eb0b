package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The DSv2 topic-as-table provider: `spark.read.format("graft-topic")`
  * over the file-replay layout — API-shape mirror of the reference's
  * `tributary_scan_topic` relation (bonus_pattern.py:22), feeding the
  * same stacked-view bonus pattern.
  */
class TopicTableProviderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stage a 2-partition topic of producer-envelope JSONL messages. */
  private def stageTopic(): String = {
    val dir = new java.io.File(TestSpark.tmpDir("topic"), "user_events")
    dir.mkdirs()
    def env(ts: String, uid: String, et: String) =
      s"""{"timestamp": "$ts", "user_id": "$uid", "user_name": "user_$uid", "event_type": "$et"}"""
    java.nio.file.Files.write(dir.toPath.resolve("part-0.jsonl"),
      java.util.Arrays.asList(
        env("2024-01-01 00:00:01", "u1", "CLICK"),
        env("2024-01-01 00:00:02", "u1", "CLICK"),
        env("2024-01-01 00:00:03", "u2", "VIEW"),
        "not json at all"))
    java.nio.file.Files.write(dir.toPath.resolve("part-1.jsonl"),
      java.util.Arrays.asList(
        env("2024-01-01 00:00:04", "u2", "CLICK"),
        env("2024-01-01 00:00:05", "u3", "CLICK"),
        env("2024-01-01 00:00:06", "u3", "CLICK")))
    dir.getAbsolutePath
  }

  test("graft-topic scan: kafka-shaped schema, file-per-partition, line-index offsets") {
    val df = spark.read.format("graft-topic").load(stageTopic())
    assert(df.schema === TopicTableProvider.Schema)
    val meta = df.select("topic", "partition", "offset")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // 2 files → partitions 0/1 in name order; offsets restart per partition
    assert(meta === Set(
      ("user_events", 0, 0L), ("user_events", 0, 1L),
      ("user_events", 0, 2L), ("user_events", 0, 3L),
      ("user_events", 1, 0L), ("user_events", 1, 1L), ("user_events", 1, 2L)))
  }

  test("graft-topic feeds the bonus pattern: stacked views over the DSv2 relation") {
    val raw = spark.read.format("graft-topic").load(stageTopic())
    graft.streaming.BonusPattern.registerViews(spark, raw)
    val top = graft.streaming.BonusPattern.topUsers(spark, 5)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    // poison line dropped (EventCodec permissive parse), CLICKs only
    assert(top === Seq(("u1", 2L), ("u3", 2L), ("u2", 1L)))
  }

  test("graft-topic re-lists per query: an appended partition shows up on the next poll") {
    val dir = stageTopic()
    val raw = spark.read.format("graft-topic").load(dir)
    assert(raw.count() === 7)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-2.jsonl"),
      java.util.Arrays.asList(
        """{"timestamp": "2024-01-01 00:00:07", "user_id": "u4", "user_name": "user_u4", "event_type": "CLICK"}"""))
    // same DataFrame, next action — planInputPartitions re-lists
    assert(raw.count() === 8)
    assert(raw.filter(col("partition") === 2).count() === 1)
  }

  test("column pruning reaches the reader: metadata-only scan carries no message bytes") {
    val df = spark.read.format("graft-topic").load(stageTopic())
      .select("partition", "offset")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("[partition,offset]"), s"\n$plan")
    assert(!plan.contains("message"), s"\n$plan")
    assert(df.count() === 7)
  }
}
