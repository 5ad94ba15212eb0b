package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the BPE trainer's corpus-grain input —
  * the distinct-word frequency table — so tokenizer (re)training
  * reads a live table instead of re-scanning the landed corpus
  * ([[graft.functions.TextAnalysis.bpeVocab]]'s scaladoc: the word-
  * frequency collapse is the trainer's ONLY corpus-grain exchange;
  * this twin moves that cost to ingest time).
  *
  * Word counts are a SUM-monoid, so folding each micro-batch's
  * counts into the stored table by key equals the batch aggregate
  * over every row ever seen — the [[Pattern11]] MERGE-upsert
  * semantics at vocabulary grain. Deliberately NOT the
  * [[SketchRefresh]] complete-mode shape: a vocabulary is corpus-
  * sublinear but UNBOUNDED (a sketch's 256 registers are not), so
  * re-emitting the whole table per batch through a complete sink
  * would grow with the corpus. The store-merge touches the arriving
  * delta plus one keyed upsert against the maintained table instead.
  *
  * Commit protocol: [[VersionedStore.transact]] keyed by batchId — a
  * replayed batch re-derives the same version from the same base
  * (never double-counts), the effectively-once posture pinned by
  * VocabRefreshSpec alongside stream ≡ batch equality and a
  * train-from-the-maintained-table ≡ train-from-the-corpus check.
  *
  * The per-batch derivation is the SHARED
  * [[graft.functions.TextAnalysis.wordFreq]] expression (the
  * no-drift discipline), so the maintained table is definitionally
  * the batch relation.
  */
object VocabRefresh {

  /** One micro-batch fold — exposed for the spec's crash-replay
    * drive (the [[TrancheLifecycle.processTranche]] idiom).
    */
  def processBatch(store: VersionedStore)(
      docs: DataFrame, batchId: Long): Unit = {
    // an empty micro-batch (idle trigger) commits nothing — the next
    // real batch bases on the latest pointer, so version-id gaps are
    // harmless (the [[TrancheLifecycle.processTranche]] symmetry)
    if (docs.isEmpty) return
    val delta = graft.functions.TextAnalysis.wordFreq(docs)
    store.transact(batchId) {
      case None => delta
      case Some(cur) =>
        // sum-monoid merge: keys in both sides add, new keys insert —
        // MERGE INTO ... WHEN MATCHED ADD / WHEN NOT MATCHED INSERT
        cur.unionByName(delta)
          .groupBy("t").agg(sum(col("n_w")).as("n_w"))
    }
  }

  /** Input: a streaming documents frame with a `text` column. */
  def start(
      docs: DataFrame,
      store: VersionedStore,
      checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      docs.writeStream
        .queryName("vocab_refresh")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch(processBatch(store) _), trigger)
      .start()
}
