package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextAnalysis

/** Streaming maintenance of the distilled classifier's training state
  * — featurize AT INGEST, so (re)training the gate model
  * ([[graft.functions.TextAnalysis.classifierModel]]) reads landed
  * tables instead of re-featurizing the corpus (the [[VocabRefresh]]
  * move-the-cost-to-ingest doctrine, at feature grain):
  *
  *  1. each micro-batch's per-doc bucket rates + teacher labels land
  *     in `batch_id=` partitions of two append-only logs via
  *     dynamic-partition overwrite — a replayed batch REWRITES its own
  *     partition, other batches untouched (the
  *     [[TrancheLifecycle.processTranche]] commit idiom);
  *  2. the CENTERING statistics — per-bucket rate sums and the doc
  *     count, the only corpus-grain aggregates the trainer needs —
  *     are SUM-monoids over the landed rows, maintained by a
  *     [[VersionedStore]] MERGE-upsert keyed by batchId (the
  *     [[VocabRefresh]] protocol: replay re-derives the same version
  *     from the same base, never double-counts; the doc count rides
  *     the same table as a reserved `f = -1` row so one transactional
  *     commit covers both).
  *
  * [[trainFromState]] then centers the landed rates with the
  * MAINTAINED sums and runs the exact batch training loop
  * ([[graft.functions.TextAnalysis.lsGradientTrain]]) — the per-batch
  * derivation is the shared
  * [[graft.functions.TextAnalysis.docRates]] /
  * [[graft.functions.TextAnalysis.docTeacher]] expressions (no-drift
  * discipline), so FeatureRefreshSpec can pin
  * train-from-state ≡ train-from-corpus weight for weight.
  */
object FeatureRefresh {

  /** Reserved bucket id carrying the doc count in the stats table. */
  private[streaming] val DocCountKey = -1L

  /** One micro-batch fold — exposed for the spec's crash-replay
    * drive.
    */
  def processBatch(ratesLog: String, teachLog: String, stats: VersionedStore)(
      docs: DataFrame, batchId: Long): Unit = {
    if (docs.isEmpty) return // idle trigger: nothing lands; the next
    // real batch bases on the latest pointer (gap-safe since the
    // VersionedStore bases strictly below the replayed version)
    val rates = TextAnalysis.docRates(docs)
    rates.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(ratesLog)
    TextAnalysis.docTeacher(docs).withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(teachLog)
    // the batch's centering delta: per-bucket rate sums + its doc
    // count under the reserved key — one frame, one sum-monoid merge
    val delta = rates.groupBy("f").agg(sum(col("xr")).as("s"))
      .unionByName(docs.agg(count(lit(1)).as("s"))
        .select(lit(DocCountKey).as("f"), col("s")))
    stats.transact(batchId) {
      case None => delta
      case Some(cur) =>
        cur.unionByName(delta).groupBy("f").agg(sum(col("s")).as("s"))
    }
  }

  /** Input: a streaming documents frame with `doc_id` and `text`. */
  def start(
      docs: DataFrame,
      ratesLog: String,
      teachLog: String,
      stats: VersionedStore,
      checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      docs.writeStream
        .queryName("feature_refresh")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch(processBatch(ratesLog, teachLog, stats) _), trigger)
      .start()

  /** (Re)train the gate model from the MAINTAINED state: landed rates
    * centered by the maintained sums, teacher from the landed labels —
    * the exact batch training path over streaming-built inputs.
    */
  def trainFromState(
      ratesLog: String, teachLog: String, stats: VersionedStore): DataFrame = {
    val statsNow = stats.read().getOrElse(
      throw new IllegalStateException("no committed feature statistics"))
    val spark = statsNow.sparkSession
    val rates = spark.read.parquet(ratesLog).drop("batch_id")
    val teach = spark.read.parquet(teachLog).drop("batch_id")
    val nDf = statsNow.filter(col("f") === DocCountKey)
      .select(col("s").as("n_docs"))
    val sums = statsNow.filter(col("f") =!= DocCountKey)
    val dense = TextAnalysis.centerRates(
      teach.select(col("doc_id")), rates, sums, nDf)
    TextAnalysis.lsGradientTrain(spark, dense, teach)
  }
}
