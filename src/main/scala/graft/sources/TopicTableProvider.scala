package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "topic as a table" provider — the API-shape mirror of
  * the reference's `tributary_scan_topic` table function
  * (bonus_pattern.py:22): a message log exposed as a batch-scannable
  * relation, so `spark.read.format("graft-topic").load(dir)` IS the
  * whole-topic scan, re-executed in full on every query exactly like
  * [[KafkaSource.batchScan]] (which needs the unresolvable connector
  * jar; this provider is the broker-less twin over the file-replay
  * layout the rest of the suite already uses).
  *
  * Storage layout — one directory per topic, one FILE per topic
  * partition (lexicographic name order fixes partition ids), one
  * newline-delimited message per line (the producer envelope,
  * FileReplaySpec's wire format). CONTRACT: messages are UTF-8 TEXT
  * envelopes — the reader decodes lines as UTF-8 and re-encodes them
  * into the binary column, so arbitrary non-UTF-8 payload bytes would
  * not round-trip (raw binary topics need a length-framed or
  * byte-splitting reader, not this newline layout; the reference's
  * producer envelope is JSON text, so the narrower contract matches
  * the modeled system). The exposed schema is the Kafka batch-scan
  * shape with `value` pre-renamed to `message` (the tributary
  * relation contract [[graft.streaming.BonusPattern.registerViews]]
  * consumes):
  *
  *   message binary, topic string, partition int, offset long,
  *   timestamp timestamp
  *
  * `offset` is the line index within its partition file; `timestamp`
  * is the file's modification time (a broker stamps append time — for
  * a replayed log the file mtime is the closest analogue; consumers
  * needing event time parse it from the envelope, as every pattern
  * does).
  *
  * Scale shape: planning lists the directory once driver-side (the
  * same O(#partitions) metadata call a Kafka admin lookup makes) and
  * emits ONE [[InputPartition]] per file, so the scan parallelizes
  * file-per-task across executors with zero shuffle — reading a
  * 1000-partition topic is 1000 independent tasks. Column pruning is
  * pushed down ([[SupportsPushDownRequiredColumns]]): a metadata-only
  * query (`count`, offset ranges) never materializes message bytes,
  * which is what keeps audit queries cheap when the payload dominates
  * the byte volume.
  */
final class TopicTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-topic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicTableProvider.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-topic requires a directory: .load(<topicDir>) or .option(\"path\", ...)"))
    val topic = Option(properties.get("topic"))
      .getOrElse(new java.io.File(dir).getName)
    new TopicTable(dir, topic)
  }
}

object TopicTableProvider {
  /** The fixed Kafka-batch-scan-shaped schema (value → `message`). */
  val Schema: StructType = StructType(Seq(
    StructField("message", BinaryType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))
}

private final class TopicTable(dir: String, topic: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-topic:$topic"
  override def schema(): StructType = TopicTableProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TopicScanBuilder(dir, topic)
}

/** Scan builder with required-column pushdown: Catalyst hands the
  * pruned schema here and the readers materialize ONLY those fields —
  * the V2 equivalent of the parquet ReadSchema pruning every other
  * scan in this library is plan-pinned on.
  */
private final class TopicScanBuilder(dir: String, topic: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TopicTableProvider.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TopicScan(dir, topic, required)
}

private final class TopicScan(dir: String, topic: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-topic $topic [${required.fieldNames.mkString(",")}]"

  // driver-side directory listing at plan time — O(#partition-files)
  // metadata, re-listed per query so a re-registered view sees files
  // appended since the last poll (the tributary re-scan semantic)
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    files.zipWithIndex.map { case (f, i) =>
      TopicFilePartition(f.getAbsolutePath, topic, i, f.lastModified() * 1000L)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(required)
}

/** One topic partition = one file; `mtimeMicros` rides along so the
  * executor never re-stats the file.
  */
private final case class TopicFilePartition(
    path: String, topic: String, partitionId: Int, mtimeMicros: Long)
  extends InputPartition

private final class TopicReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TopicPartitionReader(partition.asInstanceOf[TopicFilePartition], required)
}

/** Streams one partition file line-by-line; each projected column is
  * bound to a writer function ONCE at construction, so the per-row
  * loop is a flat array fill with no schema dispatch.
  */
private final class TopicPartitionReader(
    part: TopicFilePartition, required: StructType)
  extends PartitionReader[InternalRow] {

  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new java.io.FileInputStream(part.path),
      java.nio.charset.StandardCharsets.UTF_8))
  private var line: String = _
  private var offset: Long = -1L

  private val topicUtf8 = UTF8String.fromString(part.topic)
  private val writers: Array[() => Any] = required.fields.map { f =>
    f.name match {
      case "message" => () => line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case "topic" => () => topicUtf8
      case "partition" => () => part.partitionId
      case "offset" => () => offset
      case "timestamp" => () => part.mtimeMicros
      case other => throw new IllegalArgumentException(
        s"graft-topic has no column '$other'")
    }
  }

  override def next(): Boolean = {
    line = reader.readLine()
    if (line != null) { offset += 1; true } else false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(writers.length)
    var i = 0
    while (i < writers.length) { row.update(i, writers(i)()); i += 1 }
    row
  }

  override def close(): Unit = reader.close()
}
