package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-static enrichment — the join every production ingest runs
  * first: arriving events decorated with a warehouse dimension (user
  * profile, device registry, model/index table). The reference keeps
  * its dimension data inline in the event envelope (user_name rides
  * every message — producer.py's payload), which is exactly the
  * denormalization a real pipeline avoids; this operator is the
  * normalized form: events carry the key, the dimension stays a table.
  *
  * Two forms, because the static side's RESOLUTION TIME is the real
  * design decision:
  *   - [[start]] joins a dimension DataFrame pinned at query start —
  *     stateless (no watermark, no join state), cheapest, and correct
  *     while the dimension is immutable for the query's lifetime. A
  *     plain-parquet static side pins its FILE LISTING in the plan, so
  *     an overwrite mid-query is at best invisible and at worst a
  *     FAILED_READ_FILE — pinned in the spec, because "stream-static
  *     picks up dim updates" is a common misread of the docs.
  *   - [[startRefreshable]] re-reads the dimension path INSIDE
  *     `foreachBatch`, so every micro-batch resolves a fresh snapshot
  *     (new file listing, new broadcast) and a warehouse refresh lands
  *     on the next trigger without restarting the query — the pattern
  *     production pipelines actually run for slowly-changing dims on
  *     plain files.
  *
  * Both forms keep `left_outer` semantics: unmatched events survive
  * with null enrichment — the degraded-mode contract (a missing
  * profile must never drop a revenue event).
  *
  * Scale shape: the stream side NEVER shuffles — the dimension
  * broadcasts per batch while it fits (AQE handles the rest), so
  * enrichment adds zero exchanges to the ingest path. A dimension too
  * big to broadcast shuffle-joins on the key — at that point bucket
  * the warehouse dim on the join key (the Bench warehouse discipline)
  * and the exchange is one-sided.
  */
object Enrich {

  /** Enriched stream as a DataFrame (composable with the pattern
    * sinks); `dim` must carry `joinKey`. No broadcast hint: the
    * planner decides by the dimension's size stats, so a small dim
    * broadcasts and an oversized one degrades to a shuffle join on
    * the key instead of OOMing — the fallback the header's scale
    * shape promises (a hardcoded hint would disable it).
    */
  def enriched(
      parsed: DataFrame,
      dim: DataFrame,
      joinKey: String = "user_id"): DataFrame =
    parsed.join(dim, Seq(joinKey), "left_outer")

  /** Fixed-dimension form: append-mode memory sink, dim resolved once
    * at start.
    */
  def start(
      parsed: DataFrame,
      dim: DataFrame,
      sinkTable: String,
      joinKey: String = "user_id",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = enriched(parsed, dim, joinKey)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkTable)
    Patterns.withTrigger(w, trigger).start()
  }

  /** Refreshable-dimension form: the dimension parquet path is
    * re-read per micro-batch inside `foreachBatch`, enriched output
    * lands in `outDir`. Idempotent per batch id: each batch OVERWRITES
    * its own `batch_id=<n>` subdirectory, so a crash between the write
    * and the checkpoint commit replays the batch onto itself instead
    * of double-appending — exactly-once at the directory level.
    * Readers `spark.read.parquet(outDir)` as usual; partition
    * discovery surfaces `batch_id` as an extra long column (which
    * doubles as replay lineage).
    *
    * MIGRATION NOTE: this layout replaced a flat `mode("append")`
    * write. An outDir populated by the flat layout must be rebuilt
    * (or its files moved under a `batch_id=-1` subdirectory) before
    * resuming — mixing root-level data files with partition
    * directories fails Spark's partition discovery with "Conflicting
    * directory structures detected".
    */
  def startRefreshable(
      parsed: DataFrame,
      dimPath: String,
      outDir: String,
      checkpoint: String,
      joinKey: String = "user_id",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = batch.sparkSession.read.parquet(dimPath)
        batch.join(dim, Seq(joinKey), "left_outer")
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
    Patterns.withTrigger(w, trigger).start()
  }
}
