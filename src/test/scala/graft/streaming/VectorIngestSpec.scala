package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming ANN-index refresh: arriving vectors get sign buckets
  * bit-identical to the batch index build's assignment (shared
  * expression, shared derived plane count), appended incrementally.
  */
class VectorIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def ts(s: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("streamed bucket assignment equals the batch expression; appends accumulate across batches") {
    implicit val ctx = spark.sqlContext
    val bucketDir = TestSpark.tmpDir("vec-refresh")
    val ckpt = TestSpark.tmpDir("vec-refresh-ckpt")
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val vecs = input.toDF().toDF("vec_id", "embedding", "ingest_ts")
    val q = VectorIngest.startIndexRefresh(vecs, sfDir, bucketDir, ckpt)
    try {
      // deterministic fresh vectors in the corpus's dim
      def vec(seed: Int): Seq[Float] =
        (0 until 64).map(d => ((seed * 31 + d * 7) % 100 - 50) / 50.0f)
      input.addData(Seq((10001L, vec(1), ts(1)), (10002L, vec(2), ts(2))))
      q.processAllAvailable()
      input.addData(Seq((10003L, vec(3), ts(3))))
      q.processAllAvailable()
      val streamed = spark.read.parquet(bucketDir).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
      val batch = Seq((10001L, vec(1)), (10002L, vec(2)), (10003L, vec(3)))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          graft.ext.Similarity.bucketAssign(spark, sfDir, col("embedding")).as("bucket"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
      assert(streamed === batch)
      assert(streamed.map(_._1) === Seq(10001L, 10002L, 10003L))
    } finally q.stop()
  }
}
