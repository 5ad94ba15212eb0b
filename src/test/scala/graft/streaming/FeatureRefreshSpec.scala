package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The distilled classifier's streaming state must train the SAME
  * model as the batch corpus scan: featurize-at-ingest lands the
  * per-doc rates/labels, the centering sums maintain as a MERGE-upsert
  * monoid, and the exact batch training loop runs over the maintained
  * state — weight-for-weight parity, surviving crash replay (including
  * a replay across a skipped-empty-batch version gap, the
  * VersionedStore hazard VocabRefreshSpec pins at word grain).
  */
class FeatureRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def modelSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def statsSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("train-from-state == train-from-corpus; stats replay idempotent across a version gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ratesLog = TestSpark.tmpDir("feat-rates") + "/log"
    val teachLog = TestSpark.tmpDir("feat-teach") + "/log"
    val stats = new VersionedStore(spark, TestSpark.tmpDir("feat-stats"))
    val q = FeatureRefresh.start(
      input.toDF().toDF("doc_id", "text"), ratesLog, teachLog, stats,
      TestSpark.tmpDir("feat-ckpt"))
    // two tranches of corpus-LIKE docs (the step size in
    // lsGradientTrain is tuned for corpus-like compositions: docs of
    // ~25-40 words over a shared vocabulary, so per-bucket rate
    // deviations stay in the tens — a 5-word doc with one repeated
    // token has per-mille deviations in the hundreds and the fixed
    // step diverges, by design: production retunes the step with the
    // featurizer, not per query)
    val vocab = ("a agg batch big column customer data dup fast filter " +
      "group hash join key line merge order part query row scan slow " +
      "small sort spark stream table the value vector window").split(" ")
    val rnd = new scala.util.Random(1315L)
    def doc(id: Long): (Long, String) =
      (id, Seq.fill(25 + rnd.nextInt(16))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    val b1 = (1L to 7L).map(doc)
    val b2 = (8L to 12L).map(doc)
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // parity: the maintained state trains the batch model
    val fromState = modelSet(
      FeatureRefresh.trainFromState(ratesLog, teachLog, stats))
    val docs = (b1 ++ b2).toDF("doc_id", "text")
    val fromCorpus = modelSet(graft.functions.TextAnalysis.lsGradientTrain(
      spark, graft.functions.TextAnalysis.centeredRates(docs),
      graft.functions.TextAnalysis.docTeacher(docs)))
    assert(fromState === fromCorpus)
    assert(fromState.nonEmpty)

    // crash replay of the LAST batch: partition rewrites + same-base
    // stats re-derivation — nothing observable moves
    val statsBefore = statsSet(stats.read().get)
    FeatureRefresh.processBatch(ratesLog, teachLog, stats)(
      b2.toDF("doc_id", "text"), 1L)
    assert(statsSet(stats.read().get) === statsBefore)
    assert(modelSet(FeatureRefresh.trainFromState(ratesLog, teachLog, stats))
      === fromState)

    // empty batch commits nothing; a real batch after the gap, then
    // ITS replay, must base strictly below — never double-count
    FeatureRefresh.processBatch(ratesLog, teachLog, stats)(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 2L)
    assert(statsSet(stats.read().get) === statsBefore)
    val b3 = Seq(doc(13L))
    FeatureRefresh.processBatch(ratesLog, teachLog, stats)(
      b3.toDF("doc_id", "text"), 3L)
    val statsAfterB3 = statsSet(stats.read().get)
    assert(statsAfterB3 !== statsBefore)
    FeatureRefresh.processBatch(ratesLog, teachLog, stats)(
      b3.toDF("doc_id", "text"), 3L) // crash replay across the gap
    assert(statsSet(stats.read().get) === statsAfterB3)

    // and the maintained stats still equal the batch aggregates over
    // everything landed (the sum-monoid law, doc count included)
    val allDocs = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batchSums = statsSet(
      graft.functions.TextAnalysis.docRates(allDocs)
        .groupBy("f").agg(org.apache.spark.sql.functions.sum("xr").as("s")))
    val maintained = statsSet(stats.read().get)
    assert(maintained ===
      batchSums + ((FeatureRefresh.DocCountKey, (b1 ++ b2 ++ b3).size.toLong)))
  }
}
