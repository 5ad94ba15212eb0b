package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The BPE trainer-input refresh: the maintained word-frequency table
  * must equal the batch fold over everything ever seen (sum-monoid
  * law), survive a crash-replay without double-counting, and — the
  * point of maintaining it — train the SAME vocabulary the batch
  * corpus scan trains.
  */
class VocabRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wfSet(df: DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  private def vocabSet(df: DataFrame): Set[(Long, String, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSet

  test("maintained word counts == batch fold; replay idempotent; trainer parity") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val store = new VersionedStore(spark, TestSpark.tmpDir("vocab-store"))
    val q = VocabRefresh.start(
      input.toDF().toDF("text"), store, TestSpark.tmpDir("vocab-ckpt"))
    val b1 = Seq("aaab ccd", "aaab")
    val b2 = Seq("aaab xy", "ccd ccd")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // sum-monoid equality: the maintained table IS the batch relation
    val batchWf = graft.functions.TextAnalysis.wordFreq((b1 ++ b2).toDF("text"))
    assert(wfSet(store.read().get) === wfSet(batchWf))
    assert(wfSet(store.read().get) ===
      Set(("aaab", 3L), ("ccd", 3L), ("xy", 1L)))

    // crash replay of the LAST committed batch: transact re-derives
    // the same version from the same base — counts never double
    val before = wfSet(store.read().get)
    VocabRefresh.processBatch(store)(b2.toDF("text"), 1L)
    assert(wfSet(store.read().get) === before)

    // an empty micro-batch (idle trigger) commits no new version
    val verBefore = store.currentVersion
    VocabRefresh.processBatch(store)(Seq.empty[String].toDF("text"), 2L)
    assert(store.currentVersion === verBefore)
    assert(wfSet(store.read().get) === before)

    // trainer parity: the vocabulary trained from the maintained
    // table is the vocabulary trained from the corpus scan — the
    // stream twin plugs into the exact batch training path
    val fromStream = vocabSet(
      graft.functions.TextAnalysis.bpeVocabFromWf(spark, store.read().get))
    val fromBatch = vocabSet(
      graft.functions.TextAnalysis.bpeVocabFromWf(spark, batchWf))
    assert(fromStream === fromBatch)
    assert(fromStream.nonEmpty)

    // the gap-replay hazard: empty batch 2 left a version-id gap, so
    // a crash-replay of the NEXT real batch (3) finds no v2 — the
    // base must be the largest retained version strictly below 3
    // (v1), never the already-committed v3, or the sum-monoid merge
    // double-counts every word in batch 3
    val b3 = Seq("aaab zz")
    VocabRefresh.processBatch(store)(b3.toDF("text"), 3L)
    val afterB3 = wfSet(store.read().get)
    assert(afterB3 === Set(("aaab", 4L), ("ccd", 3L), ("xy", 1L), ("zz", 1L)))
    VocabRefresh.processBatch(store)(b3.toDF("text"), 3L) // crash replay
    assert(wfSet(store.read().get) === afterB3)
  }
}
