package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Pins the storage-level rule (Similarity.bucketedEmb scaladoc):
  * frames whose bytes grow with the corpus persist DISK_ONLY — never a
  * memory-backed level that would pin corpus-sized state into executor
  * heaps at 100 TB — and the shared frames are memoized, so one
  * session computes each exactly once no matter how many queries in
  * the family run.
  */
class StorageLevelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("corpus-sized persisted frames are DISK_ONLY") {
    assert(ext.Similarity.bucketedEmb(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    assert(ext.Dedup.explodedShingleHashes(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    assert(ext.Dedup.minhashSignatures(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    assert(ext.Similarity.knnEdges(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    assert(ext.Similarity.semAssigned(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    assert(ext.Similarity.sq8Index(spark, sf).storageLevel === StorageLevel.DISK_ONLY)
    // IVF index: 1-row quantizer may sit in memory, the inverted file
    // (carries the corpus embeddings) must not
    val (quant, assigned) = ext.Similarity.ivfIndex(spark, sf)
    assert(quant.storageLevel === StorageLevel.MEMORY_AND_DISK)
    assert(assigned.storageLevel === StorageLevel.DISK_ONLY)
  }

  test("shared frames are memoized per (session, dir) — same instance returned") {
    assert(ext.Similarity.bucketedEmb(spark, sf) eq ext.Similarity.bucketedEmb(spark, sf))
    assert(ext.Dedup.explodedShingleHashes(spark, sf) eq
      ext.Dedup.explodedShingleHashes(spark, sf))
    assert(ext.Dedup.minhashSignatures(spark, sf) eq ext.Dedup.minhashSignatures(spark, sf))
    assert(ext.Similarity.knnEdges(spark, sf) eq ext.Similarity.knnEdges(spark, sf))
  }
}
