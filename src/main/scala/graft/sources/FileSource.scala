package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-drop sources: newline-delimited JSON and CSV, batch and
  * streaming — the ingestion path when events arrive as files in
  * object storage rather than on a broker (the same wire format the
  * reference's producer emits to Kafka, landed as files).
  *
  * Scale discipline, both formats:
  *  - The schema is ALWAYS explicit. Schema inference reads the whole
  *    input once before the real scan — a full extra pass at 100 TB —
  *    and silently changes types when the data drifts. Deployments
  *    pass the contract schema; tests build it from the case model.
  *  - PERMISSIVE parse mode with a `_corrupt_record` column: malformed
  *    lines land in the corrupt column instead of failing the job —
  *    the file-source form of the reference's per-message try/except
  *    (pattern_1_1.py:64-76); callers filter or dead-letter them.
  *  - Streaming uses `maxFilesPerTrigger` to bound micro-batch size:
  *    a backlog of a million files replays at a controlled rate
  *    instead of one giant first batch.
  */
object FileSource {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def jsonlStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
}
