package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** The reference's four streaming-ingestion + incremental-aggregation
  * patterns, restated on Structured Streaming (SURVEY.md §0, §3).
  * Each pattern takes a streaming (or batch, for the bonus pattern)
  * `DataFrame` of typed events — produced by `EventCodec.parse` from
  * a Kafka/file/MemoryStream source — so the patterns are
  * source-agnostic: in production the source is
  * `spark.readStream.format("kafka")...` (exactly reference
  * pattern_2.py:38-43); in tests it is a `MemoryStream[String]`.
  */
object Patterns {

  /** The shared summary query: per-user click counts + latest activity
    * (reference pattern_1_1.py:99-106, pattern_2.py:53-57).
    */
  def clickSummary(events: DataFrame, clickType: String = "CLICK"): DataFrame =
    events
      .filter(col("event_type") === clickType)
      .groupBy("user_id", "user_name")
      .agg(
        count(lit(1)).as("count_of_clicks"),
        max(col("timestamp")).as("updated_at"))

  /** The reference fires its aggregation loop every 5 s
    * (pattern_1_1.py:124 `time.sleep(5)`; SURVEY §2.6 T1) — the Spark
    * form is a processing-time trigger. `None` (tests) = as-available.
    */
  private[streaming] def withTrigger(
      w: DataStreamWriter[Row], trigger: Option[Trigger]): DataStreamWriter[Row] =
    trigger.map(w.trigger).getOrElse(w)

}

/** Pattern 1.1 — high-watermark delta MERGE, Spark-native form.
  *
  * The reference (pattern_1_1.py:85-124) re-reads
  * `max(updated_at)`, re-aggregates only rows past it, and MERGEs
  * into `user_clicks`. In Spark the watermark read, delta predicate,
  * and monoid merge are exactly what update-mode stateful
  * aggregation does internally: the state store holds the per-user
  * aggregate, each micro-batch updates only touched keys, and
  * `foreachBatch` receives the changed keys' NEW TOTALS, which the
  * sink upserts by replacement. The two reference threads (ingest +
  * aggregate loop) collapse into one streaming query (SURVEY §3.1).
  *
  * Late data: the reference silently drops events at or before the
  * watermark (SURVEY §2.6 T6 quirk). Spark's state store has no such
  * loss — late events update their key. We keep the correct behavior
  * and document the deviation; callers wanting bounded state at
  * unbounded key cardinality add `.withWatermark` before
  * [[Patterns.clickSummary]].
  */
object Pattern11 {
  def start(
      events: DataFrame,
      store: VersionedStore,
      checkpoint: String,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      Patterns.clickSummary(events, clickType)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (changed: DataFrame, batchId: Long) =>
        // MERGE by replacement: changed keys carry their new totals
        val delta = changed.cache()
        try {
          store.transact(batchId) {
            case None => delta
            case Some(cur) =>
              cur.join(delta.select("user_id"), Seq("user_id"), "left_anti")
                .unionByName(delta)
          }
        } finally { delta.unpersist(); () }
      }
      .start()

  /** Strict-parity variant: the reference's OWN delta mechanism —
    * each cycle filters raw events by the stored high watermark
    * `max(updated_at)` and monoid-merges the delta aggregate
    * (pattern_1_1.py:93 watermark read, :105 delta predicate,
    * :110-112 merge). This faithfully reproduces the T6 quirk: an
    * event whose event-time is at or before the watermark when it
    * arrives is SILENTLY DROPPED (SURVEY §2.6 T6). [[start]] is the
    * corrected form (no loss); both are pinned in PatternsSpec.
    * (Spark's `withWatermark` cannot express this: for a
    * non-windowed aggregation there is no event-time key, so the
    * engine neither evicts state nor filters late rows.)
    *
    * The watermark is read from the SAME base snapshot the commit
    * merges into, so crash-replayed batches filter identically —
    * idempotent like everything else on [[VersionedStore]].
    */
  def startStrict(
      events: DataFrame,
      store: VersionedStore,
      checkpoint: String,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      events.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val raw = batch.cache()
        try {
          store.transact(batchId) { cur =>
            val wm = cur.flatMap(c =>
              Option(c.agg(max(col("updated_at"))).first().getTimestamp(0)))
            val fresh = wm.map(w => raw.filter(col("timestamp") > lit(w))).getOrElse(raw)
            val delta = Patterns.clickSummary(fresh, clickType)
            cur match {
              case None => delta
              case Some(c) =>
                c.unionByName(delta)
                  .groupBy("user_id", "user_name")
                  .agg(
                    sum(col("count_of_clicks")).as("count_of_clicks"),
                    max(col("updated_at")).as("updated_at"))
            }
          }
        } finally { raw.unpersist(); () }
      }
      .start()
}

/** Pattern 1.2 — change-data-feed increments, Spark-native form.
  *
  * The reference appends to a DuckLake table and computes deltas with
  * `table_changes(raw_events, from_snapshot, to_snapshot)`
  * (pattern_1_2.py:93-118). In Structured Streaming the micro-batch
  * IS the change set and `batchId` IS the snapshot id (SURVEY §2.1
  * S4/S5): each batch is (1) appended to the raw log partitioned by
  * `batch_id` — a queryable change feed with partition-pruned
  * snapshot-range scans — and (2) aggregated as a DELTA and
  * monoid-merged (count: +, updated_at: max) into the summary,
  * stamped with `last_snapshot = batchId` (reference
  * pattern_1_2.py:104 `? AS last_snapshot`).
  */
object Pattern12 {
  def start(
      events: DataFrame,
      rawLogDir: String,
      store: VersionedStore,
      checkpoint: String,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      events.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stamped = batch.withColumn("batch_id", lit(batchId)).cache()
        try {
          // 1) change feed: one partition dir per snapshot (idempotent)
          writeChangeFeed(stamped, rawLogDir)
          // 2) delta aggregate, merged into the summary
          val delta = Patterns.clickSummary(stamped.drop("batch_id"), clickType)
            .withColumn("last_snapshot", lit(batchId))
          store.transact(batchId) {
            case None => delta
            case Some(cur) =>
              cur.unionByName(delta)
                .groupBy("user_id", "user_name")
                .agg(
                  sum(col("count_of_clicks")).as("count_of_clicks"),
                  max(col("updated_at")).as("updated_at"),
                  max(col("last_snapshot")).cast("long").as("last_snapshot"))
          }
        } finally { stamped.unpersist(); () }
      }
      .start()

  /** Idempotent change-feed write: dynamic-partition-overwrite scoped
    * to the batch's OWN `batch_id=` partition (the
    * [[graft.sinks.PartitionedWrite.byDate]] idiom). A crash between
    * this write and the summary commit makes Spark replay the batch;
    * a blind `mode("append")` would then append the same partition a
    * second time and [[snapshots]]/[[tableChanges]] would double-count
    * that snapshot. Overwrite-dynamic REWRITES exactly the replayed
    * batch's directory — matching the reference's transactional CDF
    * semantics, where `table_changes` reads only committed snapshots
    * (pattern_1_2.py:105). Other batches' partitions are untouched.
    */
  private[streaming] def writeChangeFeed(stamped: DataFrame, rawLogDir: String): Unit =
    stamped.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(rawLogDir)

  /** `snapshots()` analogue (reference pattern_1_2.py:94): committed
    * snapshot ids in the raw log.
    */
  def snapshots(spark: SparkSession, rawLogDir: String): DataFrame =
    spark.read.parquet(rawLogDir).select("batch_id").distinct()

  /** `table_changes(tbl, from, to)` analogue (reference
    * pattern_1_2.py:105): rows appended in snapshot range
    * (fromExclusive, toInclusive]. Partition pruning makes this a
    * directory-selective scan, not a full-log read.
    */
  def tableChanges(
      spark: SparkSession, rawLogDir: String,
      fromExclusive: Long, toInclusive: Long): DataFrame =
    spark.read.parquet(rawLogDir)
      .filter(col("batch_id") > fromExclusive && col("batch_id") <= toInclusive)
}

/** Pattern 2 — complete-mode recompute + transactional overwrite,
  * the reference's own Spark pattern reproduced 1:1
  * (pattern_2.py:38-68: Kafka → parse → filter → groupBy/agg →
  * complete mode → foreachBatch JDBC overwrite). The overwrite goes
  * through [[VersionedStore]] for the DELETE+INSERT-in-transaction
  * semantics of pattern_2.py:108-113.
  *
  * Scale note (SURVEY §7.4): complete mode re-emits the whole
  * aggregate every batch — right only when |keys| is small (the
  * reference's 40 users). At large key cardinality use Pattern 1.1
  * (update mode).
  */
object Pattern2 {
  def start(
      events: DataFrame,
      store: VersionedStore,
      checkpoint: String,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      Patterns.clickSummary(events, clickType)
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (full: DataFrame, batchId: Long) =>
        store.transact(batchId)(_ => full) // atomic full overwrite (K3/K5)
      }
      .start()

  /** The reference's staging variant (pattern_2.py:81-113, K4+K5):
    * per-batch PARTIAL aggregates append to a staging log; the target
    * is rebuilt from staging by a second-level aggregation
    * (sum of partial counts, max of partial watermarks) inside one
    * atomic commit — an explicit partial→final two-phase aggregation.
    */
  def startWithStaging(
      events: DataFrame,
      stagingDir: String,
      store: VersionedStore,
      checkpoint: String,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      events.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Patterns.clickSummary(batch, clickType)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(stagingDir)
        val spark = batch.sparkSession
        store.transact(batchId) { _ =>
          spark.read.parquet(stagingDir)
            .groupBy("user_id", "user_name")
            .agg(
              sum(col("count_of_clicks")).as("count_of_clicks"),
              max(col("updated_at")).as("updated_at"))
        }
      }
      .start()
}

/** Streaming exact deduplication: first occurrence of each
  * (user_id, event_type, timestamp) passes, replays are dropped — the
  * streaming form of exact dedup (at-least-once upstream → effectively
  * exactly-once downstream). `dropDuplicatesWithinWatermark` keys the
  * dedup state by the chosen columns and EVICTS entries once the
  * event-time watermark passes them, so state is bounded by the
  * lateness horizon rather than growing with the stream — the only
  * form that survives an unbounded 100 TB stream (plain
  * `dropDuplicates` on a stream retains every key forever).
  */
object StreamingDedup {
  def distinctEvents(events: DataFrame, lateness: String = "1 minute"): DataFrame =
    events
      .withWatermark("timestamp", lateness)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "timestamp")

  def start(
      events: DataFrame,
      queryName: String,
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      distinctEvents(events, lateness)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}

/** Event-time windowed aggregation with a real watermark — the
  * operator where `withWatermark` genuinely bounds state (SURVEY
  * §2.6 T2): tumbling windows keyed by (window, event_type). The
  * watermark (1) lets the engine finalize and EVICT window state once
  * event time passes window-end + lateness — the property that keeps
  * state finite on an unbounded stream — and (2) drops events later
  * than the bound (contrast Pattern11: a non-windowed aggregate has
  * no event-time key, so a watermark there can neither evict nor
  * filter; its strict mode hand-rolls the predicate instead).
  *
  * Append output mode emits each window exactly once, when it
  * finalizes — the streaming form of an hourly/daily rollup feed.
  */
object WindowedAgg {
  /** Tumbling by default; pass `slide < windowDuration` for SLIDING
    * windows (each event lands in `window/slide` overlapping windows —
    * the hourly-window-every-ten-minutes rollup shape). State grows by
    * the same factor but stays bounded by the lateness horizon exactly
    * as in the tumbling case: a window's state is evicted when the
    * watermark passes its end.
    */
  def counts(
      events: DataFrame,
      windowDuration: String = "1 minute",
      lateness: String = "1 minute",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("timestamp", lateness)
      .groupBy(
        window(col("timestamp"), windowDuration, slide.getOrElse(windowDuration)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  def start(
      events: DataFrame,
      queryName: String,
      windowDuration: String = "1 minute",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None,
      slide: Option[String] = None): StreamingQuery =
    Patterns.withTrigger(
      counts(events, windowDuration, lateness, slide)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName), trigger)
      .start()
}

/** Trending top-K — the live "what's hot right now" feed over the
  * windowed counts: maintain per-(window, event_type) counts in UPDATE
  * mode (late-but-within-watermark events revise a window's ranking
  * instead of being frozen out, unlike append mode which emits each
  * window exactly once), upsert the revised rows into a
  * [[VersionedStore]] with Pattern 1.1's replacement-merge idiom, and
  * serve the per-window top-K as a derived view over the maintained
  * counts.
  *
  * Scale shape: the streaming aggregation's state is bounded by the
  * watermark exactly as in [[WindowedAgg]]; each micro-batch ships
  * only CHANGED (window, type) rows to the sink; and the top-K view's
  * window function partitions by `window_start` — a uniform key whose
  * per-partition cardinality is the event-type alphabet, so no reducer
  * ever sees more than |types| rows per window. The ranking is
  * deterministic under ties (count DESC, type ASC).
  */
object Trending {
  def start(
      events: DataFrame,
      store: VersionedStore,
      checkpoint: String,
      windowDuration: String = "1 minute",
      lateness: String = "1 minute",
      trigger: Option[Trigger] = None): StreamingQuery =
    Patterns.withTrigger(
      WindowedAgg.counts(events, windowDuration, lateness)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint), trigger)
      .foreachBatch { (changed: DataFrame, batchId: Long) =>
        // MERGE by replacement on the composite key: changed rows
        // carry their windows' new totals (Pattern11.start idiom)
        val delta = changed.cache()
        try {
          store.transact(batchId) {
            case None => delta
            case Some(cur) =>
              cur.join(delta.select("window_start", "event_type"),
                Seq("window_start", "event_type"), "left_anti")
                .unionByName(delta)
          }
        } finally { delta.unpersist(); () }
      }
      .start()

  /** The per-window top-K ranking from the maintained counts (None
    * before the first commit).
    */
  def topK(store: VersionedStore, k: Int = 3): Option[DataFrame] =
    store.read().map { counts =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("window_start")
        .orderBy(col("n_events").desc, col("event_type").asc)
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
}

/** Bonus pattern — stateless streaming views (reference
  * bonus_pattern.py:17-55): the topic is exposed as a scannable
  * relation; two stacked views re-derive the summary on EVERY query;
  * a poll loop reads the top-5. No state anywhere — each query
  * re-scans the source (SURVEY §2.1 S3: batch Kafka scan with
  * earliest→latest offsets; here any re-readable batch DataFrame).
  *
  * `registerViews` is called per poll, mirroring the per-query
  * re-scan: view inlining makes each top-5 query re-execute the full
  * parse → filter → aggregate over the source's current contents.
  * O(topic) per query by design — the semantic spec of a streaming
  * view, not a perf path (SURVEY §7.4).
  */
object BonusPattern {
  /** @param rawMessages batch frame with a `message` column of JSON
    *                    bytes/strings (reference's
    *                    `tributary_scan_topic` relation shape).
    */
  def registerViews(
      spark: SparkSession,
      rawMessages: DataFrame,
      clickType: String = "CLICK"): Unit = {
    // raw_events_view: SELECT * EXCLUDE message + decoded fields
    // (bonus_pattern.py:17-23)
    EventCodec.parse(rawMessages, "message").createOrReplaceTempView("raw_events_view")
    // user_clicks_view: the stacked aggregate view (bonus_pattern.py:24-41)
    spark.sql(
      s"""SELECT user_id, user_name,
                 count(*) AS count_of_clicks,
                 max(timestamp) AS updated_at
          FROM raw_events_view
          WHERE event_type = '$clickType'
          GROUP BY user_id, user_name""")
      .createOrReplaceTempView("user_clicks_view")
  }

  /** The polled top-K query (bonus_pattern.py:50). */
  def topUsers(spark: SparkSession, n: Int): DataFrame =
    spark.sql(
      s"""SELECT * FROM user_clicks_view
          ORDER BY count_of_clicks DESC, user_id ASC LIMIT $n""")

  /** Continuously-maintained trending top-K — the STATEFUL twin of
    * the polled view stack above (and of the batch `bonus_topk`
    * query): instead of re-scanning the whole topic per poll, the
    * per-user counts live in streaming aggregation state and every
    * trigger emits the complete current top-K. Complete-mode sort +
    * limit is the supported streaming TakeOrdered plan: the sort runs
    * over the AGGREGATED key space (per-user totals), never the event
    * stream, and the K-row result replaces the sink table per batch.
    *
    * At scale the poll form is O(topic) per query while this is
    * O(delta) per trigger — the exact re-scan-vs-incremental tradeoff
    * the reference's bonus pattern demonstrates on the poll side
    * (SURVEY §7.4); together they bracket it from both ends. State is
    * one (count, max-ts) pair per user, the same monoid
    * [[Patterns.clickSummary]] maintains everywhere else.
    */
  def startTopK(
      parsed: DataFrame,
      sinkTable: String,
      n: Int = 5,
      clickType: String = "CLICK",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = Patterns.clickSummary(parsed, clickType)
      .orderBy(col("count_of_clicks").desc, col("user_id").asc)
      .limit(n)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkTable)
    Patterns.withTrigger(w, trigger).start()
  }
}
