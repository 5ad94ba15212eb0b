package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat media (image/audio/video) as an
  * opaque `binary` payload column with typed metadata, and run
  * decode / feature-extraction as a partition-batched pass over a
  * typed `Dataset`.
  *
  * The decode itself is a STUB — this container has no image/audio
  * codecs — replaced by a deterministic fake that derives metadata
  * from the raw bytes (length, first byte, byte checksum), so the
  * pipeline is end-to-end testable and oracle-checkable. Swapping in
  * a real decoder changes ONLY the body of [[MediaDecoder.decode]];
  * the Spark-side contract (binary column in, typed metadata out,
  * partition-batched execution) is the real, tested thing.
  *
  * Scale design (100 TB of media):
  *  - Payloads travel as parquet `binary`; the scan prunes to exactly
  *    the payload + id columns.
  *  - `mapPartitions` (not a per-row UDF) so a real decoder can
  *    amortize per-partition setup — codec init, model load, GPU
  *    context — across the whole partition, the same batching
  *    rationale as Arrow/Pandas UDFs in PySpark.
  *  - Decode output is a narrow typed row; the heavy binary column is
  *    dropped before any shuffle. Downstream relational work (joins,
  *    aggregation) happens on metadata, never on payload bytes.
  */
object Multimodal {

  /** Input contract: id + opaque payload (here: utf-8 bytes of the
    * document text standing in for an encoded media blob).
    */
  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** Decoded-media metadata, the narrow output row. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Int,
      format: String,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** STUB decoder — deterministic fake in place of a real codec
    * (??? no image/audio libs in this container). A production build
    * implements this with the real library; everything around it is
    * unchanged.
    */
  object MediaDecoder {
    def decode(p: MediaPayload): MediaMeta = {
      val n = p.payload.length.toLong
      val first = if (p.payload.nonEmpty) p.payload(0) & 0xff else 0
      val fmt = (first % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      var sum = 0L
      var i = 0
      while (i < p.payload.length) { sum += (p.payload(i) & 0xff); i += 1 }
      MediaMeta(
        doc_id = p.doc_id,
        n_bytes = n,
        first_byte = first,
        format = fmt,
        width = 64L + (n % 512L),
        height = 64L + ((n / 7L) % 512L),
        n_frames = 1L + (n % 16L),
        checksum = sum % 65536L)
    }
  }

  /** The payload table: id + binary column (+ metadata the scan can
    * prune to).
    */
  def payloads(spark: SparkSession, sfDir: String): Dataset[MediaPayload] = {
    import spark.implicits._
    // documentsRaw: no round-robin repartition — the payload bytes must
    // never cross an exchange; decode runs on the scan partitions and
    // only the small metadata shuffles afterwards
    Tables.documentsRaw(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaPayload]
  }

  /** Partition-batched decode: one decoder instance per partition,
    * streamed over the partition's rows.
    */
  def decodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, sfDir)
      .mapPartitions { it =>
        // per-partition setup happens here (codec/model init in a
        // real decoder); the stub needs none
        it.map(MediaDecoder.decode)
      }
      .toDF()
  }

  /** Frame sampling: explode each media item into every-4th-frame
    * index rows — the row-multiplying shape of video frame extraction
    * (metadata only; a real pipeline would carry the decoded frame
    * tensor alongside).
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"))

  val oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb
           FROM documents)
         SELECT doc_id,
                nb AS n_bytes,
                CASE WHEN nb = 0 THEN 0
                     ELSE ('0x' || substr(hx, 1, 2))::INT END AS first_byte,
                CASE ((CASE WHEN nb = 0 THEN 0
                            ELSE ('0x' || substr(hx, 1, 2))::INT END) % 3)
                  WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
                64 + (nb % 512) AS width,
                64 + ((nb // 7) % 512) AS height,
                1 + (nb % 16) AS n_frames,
                CAST(coalesce(list_sum(
                  [('0x' || substr(hx, 2*i+1, 2))::BIGINT for i in range(nb)]), 0)
                  % 65536 AS BIGINT) AS checksum
         FROM b""",
    "mm_frame_sample" ->
      """SELECT doc_id, frame_idx, n_frames FROM (
           SELECT doc_id,
                  1 + (octet_length(encode(text)) % 16) AS n_frames,
                  unnest(range(0, 1 + (octet_length(encode(text)) % 16), 4)) AS frame_idx
           FROM documents)""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> decodeMeta _,
    "mm_frame_sample" -> frameSample _,
  )
}
