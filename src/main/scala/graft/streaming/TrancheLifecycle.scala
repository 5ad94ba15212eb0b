package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming tranche lifecycle — the continuously-maintained twin of
  * the batch release chain `TrancheLifecycleSpec` pins on fixtures:
  *
  *   tranche micro-batch lands → INCREMENTAL exact pairs (new×old and
  *   new×new only, the prefix-filter completeness guarantee) →
  *   WARM-START connected components over (prior label forest ∪ new
  *   pairs) → refreshed per-source release card
  *
  * run inside `foreachBatch` with crash-safe, idempotent commits — the
  * pipeline-grain analogue of the reference's incremental snapshot
  * maintenance (pattern_1_2.py:93-118: land the change feed, fold the
  * delta into the summary, never recompute the landed past).
  *
  * Commit protocol (two artifacts, one batch id):
  *  1. the tranche's exploded shingle rows land in a `batch_id=`
  *     partition of the corpus log via dynamic-partition overwrite
  *     ([[Pattern12.writeChangeFeed]]'s idiom) — a replayed batch
  *     REWRITES its own partition, other tranches untouched;
  *  2. the label forest commits through [[VersionedStore.transact]]
  *     keyed by the SAME batchId — a retry re-derives the same
  *     version from the same base instead of double-applying.
  *  A crash between 1 and 2 replays the batch: step 1 rewrites
  *  identical rows, step 2 recomputes the identical forest — the
  *  effectively-once posture of every sink in this library (SURVEY
  *  §2.6 T5).
  *
  * State shape at 100 TB: the store holds the label FOREST (non-root
  * rows only — singletons are implicit roots), which is duplicate-
  * cluster-sized, not corpus-sized; the corpus log is append-only
  * partitions, never rewritten as a whole. Per tranche, the pair
  * decomposition re-reads the landed log once (`allPairsIncremental`'s
  * df/prefix derivation needs global document frequencies) — the
  * recompute the reference's complete-mode patterns accept — while
  * PAIR work is incremental: old×old candidates are never re-verified.
  *
  * Contract: doc_ids are assigned monotonically at ingest (every id in
  * tranche N+1 exceeds every landed id), which is what makes "new" a
  * simple id cutoff — the fixture topology and any sequence-stamped
  * landing corpus satisfy it.
  */
object TrancheLifecycle {

  /** One tranche fold — exposed (not just closed over by [[start]])
    * so the spec can drive a crash-retry of a committed batch
    * directly, the [[PatternsSpec]] replay idiom.
    */
  def processTranche(corpusLog: String, labels: VersionedStore)(
      tranche: DataFrame, batchId: Long): Unit = {
    val spark = tranche.sparkSession
    if (tranche.isEmpty) return // nothing to land; later batches base
    // on the latest committed pointer, so id gaps are harmless
    // ── 1. land the tranche (idempotent partition rewrite)
    tranche.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusLog)
    // ── 2. incremental pairs over the landed corpus: the cutoff is
    // this tranche's smallest id (monotone-id contract above), so
    // only pairs whose larger endpoint is in THIS tranche come out
    val cutoff = tranche.agg(min(col("doc_id"))).head().getLong(0)
    val full = spark.read.parquet(corpusLog).drop("batch_id")
    val pairsNew = Dedup.allPairsIncrementalOn(full, cutoff)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // ── 3. warm-start components from (prior forest ∪ new pairs),
    // committed as the batch's label-forest version
    labels.transact(batchId) { prior =>
      val edges = prior match {
        case Some(forest) =>
          forest.select(col("v").as("src"), col("comp").as("dst"))
            .unionByName(pairsNew)
        case None => pairsNew
      }
      Dedup.starComponents(edges)._1.filter(col("v") =!= col("comp"))
    }
  }

  /** Input: a streaming frame of exploded shingle rows (`doc_id`,
    * `sz`, `h`) — the corpus-prep ingest's landed shape. Each
    * micro-batch is one tranche.
    */
  def start(
      tranches: DataFrame,
      corpusLog: String,
      labels: VersionedStore,
      checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      tranches.writeStream
        .queryName("tranche_lifecycle")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch(processTranche(corpusLog, labels) _), trigger)
      .start()

  /** The per-source release card over the committed label forest —
    * the read-side view a release audit queries: docs in, docs kept
    * (keeper = any doc that is not a non-root forest node). Derived
    * at read time from the compact forest, never stored.
    */
  def releaseCard(docs: DataFrame, labels: VersionedStore): DataFrame = {
    val losers = labels.read() match {
      case Some(forest) =>
        forest.select(col("v").as("doc_id"), lit(true).as("is_loser"))
      case None =>
        docs.select(col("doc_id"), lit(true).as("is_loser")).limit(0)
    }
    docs.join(losers, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs_in"),
        count(when(col("is_loser").isNull, 1)).as("docs_kept"))
  }
}
