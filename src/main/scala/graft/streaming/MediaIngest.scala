package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming multimodal ingest — the byte-exact payload-dedup gate
  * ([[graft.ext.Multimodal.payloadDedup]]'s policy: first arrival by
  * doc_id wins per checksum) applied at the door, with the payload
  * BYTES kept out of every exchange:
  *
  *  1. per micro-batch, checksums are computed in a projection and the
  *     dedup DECISION (keeper aggregate + landed-hash anti-join) runs
  *     on (doc_id, payload_md5) rows ONLY — those two operators never
  *     carry the binary column (the [[graft.ext.Multimodal]] scale
  *     discipline, streamed). The payload itself crosses an exchange
  *     at most once, in the re-attach join of point 2, and only when
  *     the keeper side does not broadcast — and that exchange is
  *     per-batch bounded by the source trigger size (maxOffsets /
  *     maxFiles per trigger), which is the actual safety argument:
  *     no plan here ever shuffles more payload bytes than one
  *     trigger admits;
  *  2. the winning ids re-attach to their payloads through an
  *     equi-join on (payload_md5, doc_id) whose strategy is left to
  *     stats/AQE — NO broadcast hint: on the normal trigger path the
  *     keeper set is micro-batch-sized and AQE broadcasts it anyway,
  *     but on a backfill/restart batch (earliest-offset replay of a
  *     large topic) it is corpus-sized and a forced broadcast would
  *     OOM the driver. When the keeper side cannot broadcast
  *     (backfill, or a deployment with AQE disabled and no usable
  *     stats), the re-attach degrades to ONE bounded shuffle of the
  *     batch's payload rows — deliberately the scale-safe direction
  *     of the trade: an exchange spills to disk, an over-large driver
  *     broadcast does not;
  *  3. landed state is a checksum-only parquet index (16-byte rows per
  *     landed payload, not the media itself) read back per batch — the
  *     cross-batch memory of the gate, the same filter-as-data shape
  *     as the decontamination bitmap.
  *
  * Idempotent per batch id: data and hash-index rows land under
  * `batch_id=<n>` subdirectories that a replayed batch OVERWRITES onto
  * itself (the [[Enrich.startRefreshable]] contract), so a crash
  * between write and checkpoint commit cannot double-land media.
  */
object MediaIngest {

  /** Landed checksum index, EXCLUDING the current batch's own
    * partition: a crash-replayed batch re-runs with the same batchId
    * and must not see the hashes it wrote before the crash, or the
    * anti-join would empty its keeper set and the idempotent overwrite
    * would replace the batch's landed media with nothing. Only the
    * missing-directory case (first batch ever) maps to empty — any
    * real read error propagates so the checkpoint retries the batch
    * instead of silently resetting the gate's memory.
    */
  private def landedHashes(spark: SparkSession, dir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/_hashes")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      import spark.implicits._
      Seq.empty[String].toDF("payload_md5")
    } else
      spark.read.parquet(path.toString)
        .filter(col("batch_id") =!= batchId)
        .select("payload_md5")
  }

  /** The batch's dedup decision as (keepers, fresh) frames, factored
    * out so the plan shape is directly pinnable: the keeper re-attach
    * join MUST carry no broadcast hint (see class doc point 2).
    */
  private[streaming] def batchPlan(batch: DataFrame, landed: DataFrame): (DataFrame, DataFrame) = {
    val hashed = batch.select(col("doc_id"), col("payload"),
      md5(col("payload")).as("payload_md5"))
    val keepers = hashed.select("doc_id", "payload_md5")
      .join(landed, Seq("payload_md5"), "left_anti")
      .groupBy("payload_md5").agg(min(col("doc_id")).as("doc_id"))
    val fresh = hashed.join(keepers, Seq("payload_md5", "doc_id"))
    (keepers, fresh)
  }

  /** One micro-batch of the gate, factored so the crash-replay path
    * (same batchId re-entering after the writes but before the
    * checkpoint commit) is directly testable.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long, outDir: String): Unit = {
    val spark = batch.sparkSession
    val (keepers, fresh) =
      batchPlan(batch, landedHashes(spark, outDir, batchId))
    fresh.select("doc_id", "payload_md5", "payload")
      .write.mode("overwrite").parquet(s"$outDir/data/batch_id=$batchId")
    keepers.select("payload_md5")
      .write.mode("overwrite").parquet(s"$outDir/_hashes/batch_id=$batchId")
  }

  def startPayloadDedup(
      media: DataFrame,
      outDir: String,
      checkpoint: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, outDir)
      }
    Patterns.withTrigger(w, trigger).start()
  }
}
