package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vector-index maintenance — the ANN twin of
  * [[CorpusPrep.startIndexRefresh]]: freshly-embedded vectors arrive
  * continuously (a re-embedding job, a new crawl epoch) and must
  * become searchable without rebuilding the LSH index over the whole
  * corpus. Each micro-batch assigns sign buckets with the SAME
  * expression and the SAME derived plane count the batch index build
  * used ([[graft.ext.Similarity.bucketAssign]] — bit-identical by
  * construction, reading the memoized index rather than re-deriving
  * it) and APPENDS (vec_id, bucket) rows to the bucket table, so the
  * serving paths' bucket-equality joins see new vectors on their next
  * scan.
  *
  * The plane count is pinned at refresh START: a corpus that outgrows
  * its signature width (the [[graft.ext.Similarity]] `planesFor`
  * occupancy rule) is an INDEX REBUILD, not a refresh — the batch
  * build owns that lifecycle, exactly as the MinHash refresh defers
  * banding to the batch pass.
  *
  * Scale shape: per-batch work is one stateless projection over the
  * arriving vectors (the 2·planes dot products per row, codegen'd);
  * the append is partition-local parquet. Checkpointed with the same
  * replay tolerance as the MinHash refresh: a crash before commit
  * re-appends a batch, and the bucket join downstream is insensitive
  * to duplicate (vec_id, bucket) rows.
  */
object VectorIngest {

  def startIndexRefresh(
      vecs: DataFrame,
      sfDir: String,
      bucketDir: String,
      checkpoint: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.select(col("vec_id"),
            graft.ext.Similarity.bucketAssign(spark, sfDir, col("embedding"))
              .as("bucket"))
          .write.mode("append").parquet(bucketDir)
      }
    Patterns.withTrigger(w, trigger).start()
  }
}
