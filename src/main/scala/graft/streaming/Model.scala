package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream data model, matching the reference's producer message
  * shape (reference scripts/producer.py:73-78: flat JSON with ISO-8601
  * `timestamp`, `user_id`, `user_name`, `event_type`; key = user_id
  * bytes at producer.py:83).
  */
final case class Event(
    timestamp: java.sql.Timestamp,
    user_id: String,
    user_name: String,
    event_type: String)

/** Per-user summary row (reference raw/summary DDL at
  * pattern_1_1.py:32-39; pattern 1.2 adds `last_snapshot`,
  * pattern_1_2.py:37).
  */
final case class ClickSummary(
    user_id: String,
    user_name: String,
    count_of_clicks: Long,
    updated_at: java.sql.Timestamp)

/** JSON codec for the Kafka value bytes: permissive parse, malformed
  * or field-incomplete messages dropped — the log-and-continue
  * semantics of the reference's per-message try/except
  * (pattern_1_1.py:64-76), expressed as `from_json` → null → filter
  * (SURVEY.md §2.6 T8).
  */
object EventCodec {

  /** Wire schema: all strings; the timestamp is an ISO-8601 string
    * parsed after extraction (reference pattern_1_1.py:70,
    * pattern_2.py:51).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("user_id", StringType),
    StructField("user_name", StringType),
    StructField("event_type", StringType)))

  /** Kafka-style frame in (`value` binary/string column) → typed event
    * columns out; bad rows dropped.
    */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(valueCol).cast("string"), wireSchema).as("data"))
      .select("data.*")
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .filter(
        col("timestamp").isNotNull && col("user_id").isNotNull &&
          col("user_name").isNotNull && col("event_type").isNotNull)

  /** Events → JSON value frames (the producer side, for tests and
    * loopback pipelines).
    */
  def toJson(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
      col("user_id"), col("user_name"), col("event_type"))).as("value"))
}
