package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming payload-dedup gate: first arrival per checksum lands,
  * in-batch and cross-batch duplicates are suppressed, and the landed
  * hash index accumulates.
  */
class MediaIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("first arrival per checksum lands; in-batch and cross-batch replays are suppressed") {
    implicit val ctx = spark.sqlContext
    val outDir = TestSpark.tmpDir("media-ingest")
    val ckpt = TestSpark.tmpDir("media-ingest-ckpt")
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = input.toDF().toDF("doc_id", "payload", "ingest_ts")
    val q = MediaIngest.startPayloadDedup(media, outDir, ckpt)
    try {
      val imgA = Array.tabulate[Byte](64)(i => (i * 3).toByte)
      val imgB = Array.tabulate[Byte](64)(i => (i * 5 + 1).toByte)
      val imgC = Array.tabulate[Byte](64)(i => (i * 7 + 2).toByte)
      input.addData(Seq(
        (7L, imgA, ts(1)),
        (3L, imgA, ts(2)),   // in-batch duplicate → keeper is min id 3
        (9L, imgB, ts(3))))
      q.processAllAvailable()
      input.addData(Seq(
        (20L, imgA, ts(4)),  // cross-batch duplicate → suppressed
        (21L, imgC, ts(5)))) // novel → lands
      q.processAllAvailable()
      val landed = spark.read.parquet(s"$outDir/data")
        .select("doc_id", "payload").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(landed.keySet === Set(3L, 9L, 21L))
      assert(landed(3L) === imgA.toSeq)
      assert(landed(21L) === imgC.toSeq)
      // hash index carries one row per distinct landed payload
      val nHashes = spark.read.parquet(s"$outDir/_hashes")
        .select("payload_md5").distinct().count()
      assert(nHashes === 3L)

      // the gate's memory is the landed index, not query state: a
      // RESTARTED query (same checkpoint + outDir) still suppresses a
      // replayed payload and admits a novel one
      q.stop()
      val q2 = MediaIngest.startPayloadDedup(media, outDir, ckpt)
      try {
        val imgD = Array.tabulate[Byte](64)(i => (i * 11 + 3).toByte)
        input.addData(Seq(
          (30L, imgA, ts(6)),   // post-restart replay → suppressed
          (31L, imgD, ts(7))))  // novel → lands
        q2.processAllAvailable()
        val after = spark.read.parquet(s"$outDir/data")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(after === Set(3L, 9L, 21L, 31L))
      } finally q2.stop()
    } finally scala.util.Try(q.stop()) // already stopped on the happy path
  }

  test("crash-replay of a batch is idempotent: landed media and hashes survive, byte-identical") {
    val outDir = TestSpark.tmpDir("media-replay")
    val imgA = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val imgB = Array.tabulate[Byte](64)(i => (i * 5 + 1).toByte)
    def batch(rows: Seq[(Long, Array[Byte])]) = rows.toDF("doc_id", "payload")
    MediaIngest.processBatch(batch(Seq(1L -> imgA)), 0L, outDir)
    val second = batch(Seq(2L -> imgA, 3L -> imgB)) // 2 is a dup of landed imgA
    MediaIngest.processBatch(second, 1L, outDir)
    def landed() = spark.read.parquet(s"$outDir/data")
      .select("doc_id", "payload_md5").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val before = landed()
    assert(before.map(_._1) === Seq(1L, 3L))
    // crash between write and checkpoint commit → the SAME batch id
    // re-enters with the same data; the gate must not see its own
    // partial writes and must reproduce the identical landing
    MediaIngest.processBatch(second, 1L, outDir)
    assert(landed() === before)
    val hashes = spark.read.parquet(s"$outDir/_hashes")
      .select("payload_md5").distinct().count()
    assert(hashes === 2L)
  }

  test("keeper re-attach join carries no broadcast hint — stats/AQE decide") {
    // The keeper set is micro-batch-sized on the trigger path but
    // corpus-sized on a backfill/earliest-offset replay batch; a
    // hardcoded broadcast hint would OOM the driver there. Mirror of
    // the q10/q14 no-hint pin in PlanShapeSpec.
    val imgA = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val batch = Seq(1L -> imgA).toDF("doc_id", "payload")
    val landed = Seq.empty[String].toDF("payload_md5")
    val (keepers, fresh) = MediaIngest.batchPlan(batch, landed)
    for (df <- Seq(keepers, fresh)) {
      val logical = df.queryExecution.analyzed.toString
      assert(!logical.contains("ResolvedHint"), s"\n$logical")
    }
  }
}
