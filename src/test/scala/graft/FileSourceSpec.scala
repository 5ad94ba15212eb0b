package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** File-drop ingestion: explicit-schema JSONL/CSV reads, poison lines
  * quarantined in `_corrupt_record` instead of failing the job, and
  * the streaming JSONL source replaying a directory into the same
  * summary the batch path computes.
  */
class FileSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("timestamp", TimestampType)
    .add("user_id", "string")
    .add("event_type", "string")

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    ()
  }

  test("jsonl batch: explicit schema, malformed lines quarantined not fatal") {
    val dir = TestSpark.tmpDir("jsonl-batch")
    writeLines(dir, "part1.jsonl", Seq(
      """{"timestamp":"2024-01-01T00:00:01","user_id":"u1","event_type":"CLICK"}""",
      """{"timestamp":"2024-01-01T00:00:02","user_id":"u2","event_type":"CLICK"}""",
      """this is not json""",
      """{"timestamp":"2024-01-01T00:00:03","user_id":"u1","event_type":"VIEW"}"""))
    val df = sources.FileSource.jsonl(spark, dir, schema).cache()
    assert(df.filter(col(sources.FileSource.CorruptCol).isNotNull).count() === 1)
    val good = df.filter(col(sources.FileSource.CorruptCol).isNull)
    assert(good.count() === 3)
    assert(good.filter(col("event_type") === "CLICK").count() === 2)
  }

  test("csv batch: explicit schema with header") {
    val dir = TestSpark.tmpDir("csv-batch")
    writeLines(dir, "events.csv", Seq(
      "timestamp,user_id,event_type",
      "2024-01-01T00:00:01,u1,CLICK",
      "2024-01-01T00:00:02,u2,VIEW"))
    // cache first: Spark refuses corrupt-record-only queries on raw files
    val df = sources.FileSource.csv(spark, dir, schema).cache()
    assert(df.filter(col(sources.FileSource.CorruptCol).isNull).count() === 2)
    assert(df.agg(max("user_id")).head.getString(0) === "u2")
  }

  test("jsonl streaming source replays to the batch ground truth") {
    val dir = TestSpark.tmpDir("jsonl-stream")
    writeLines(dir, "a.jsonl", (1 to 40).map(i =>
      s"""{"timestamp":"2024-01-01T00:00:${"%02d".format(i % 60)}","user_id":"u${i % 4}","event_type":"CLICK"}"""))
    writeLines(dir, "b.jsonl", (41 to 80).map(i =>
      s"""{"timestamp":"2024-01-01T00:01:${"%02d".format(i % 60)}","user_id":"u${i % 4}","event_type":"CLICK"}"""))
    val counts = sources.FileSource
      .jsonlStream(spark, dir, schema, maxFilesPerTrigger = 1)
      .filter(col(sources.FileSource.CorruptCol).isNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("jsonl_stream_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("jsonl_stream_out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("u0" -> 20L, "u1" -> 20L, "u2" -> 20L, "u3" -> 20L))
    } finally q.stop()
  }
}
