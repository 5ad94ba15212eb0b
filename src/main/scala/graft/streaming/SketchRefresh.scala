package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._

/** Streaming HLL-register maintenance — the cardinality-sketch twin of
  * [[VectorIngest]]: documents arrive continuously and the per-source
  * distinct-n-gram registers (`graft.functions.TextAnalysis.hllNgrams`)
  * must stay current without re-scanning the landed corpus. HLL
  * registers are a max-monoid, so the streaming form IS the batch
  * form: each arriving document folds into `max(ρ)` per (source,
  * register) — no distinct state, no n-gram retention, nothing to
  * evict.
  *
  * The hash/rank derivation is the SHARED
  * [[graft.functions.TextAnalysis.hllRegisterTriples]] expression (the
  * `qualityScore` no-drift discipline), so a register table maintained
  * by this stream is bit-identical to one rebuilt by the batch sketch
  * over the same rows — pinned by SketchRefreshSpec.
  *
  * Scale shape: per-batch work is a stateless explode/hash projection
  * over ARRIVING documents only; the aggregation state is bounded at
  * sources × 256 rows regardless of corpus size (the whole point of a
  * sketch), which is why complete output mode is safe here and only
  * here — the "result table" is the sketch itself, not the corpus.
  */
object SketchRefresh {

  /** Register table (source, j, m) from a batch OR streaming documents
    * frame — one shared derivation for both lifecycles.
    */
  def registers(docs: DataFrame): DataFrame =
    graft.functions.TextAnalysis.hllRegisterTriples(docs)
      .groupBy("source", "j").agg(max("rho").as("m"))

  /** Shared starter: every sketch refresh is the same lifecycle —
    * complete mode into a memory table `queryName` (tests; production
    * swaps the sink for the warehouse sketch table — the plan upstream
    * of the sink is unchanged), optionally checkpointed so the
    * aggregation state (registers/counters/candidates) survives a
    * crash/redeploy and the recovered table still equals the batch
    * fold over ALL rows ever seen — pinned by SketchRefreshSpec.
    */
  private def startComplete(
      sketch: DataFrame,
      queryName: String,
      trigger: Option[Trigger],
      checkpoint: Option[String]): StreamingQuery = {
    val w = sketch.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
    val wc = checkpoint.fold(w)(dir => w.option("checkpointLocation", dir))
    Patterns.withTrigger(wc, trigger).start()
  }

  /** Start the register refresh into an in-memory/complete sink table
    * `queryName` (tests; production swaps the sink for the warehouse
    * register table — the plan upstream of the sink is unchanged).
    */
  def start(
      docs: DataFrame,
      queryName: String,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(registers(docs), queryName, trigger, checkpoint)

  /** Count-Min counter table (r, b, c) from a batch OR streaming
    * documents frame — counters are a SUM-monoid (vs the registers'
    * max), so arriving occurrences simply add into their cells; state
    * stays bounded at depth × width cells regardless of corpus size.
    */
  def cmsCounters(docs: DataFrame): DataFrame =
    graft.functions.TextAnalysis.cmsPairs(docs)
      .groupBy("r", "b").agg(count(lit(1)).as("c"))

  /** Start the Count-Min counter refresh (complete mode into a memory
    * table `queryName`) — same lifecycle as [[start]].
    */
  def startCms(
      docs: DataFrame,
      queryName: String,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(cmsCounters(docs), queryName, trigger, checkpoint)

  /** Misra–Gries candidate summary — `(cand: array<long>, total)` —
    * from a batch OR streaming documents frame: the heavy-hitter leg
    * of the streaming sketch suite (HLL counts distincts, CMS answers
    * point frequencies, MG names the candidates worth confirming).
    * Tokens fold through the SHARED
    * [[graft.functions.TextAnalysis.tokenHashes]] key expression.
    *
    * Semantics differ from the max/sum twins above in one honest way:
    * MG's internal counters are ORDER-dependent, so stream and batch
    * need not produce bit-identical summaries in general. What the
    * streaming form maintains — and SketchRefreshSpec pins — is the
    * sketch's actual contract: the one-sided guarantee (every key
    * above 1/(k+1) of ALL mass seen so far is present among the ≤ k
    * candidates) survives the state-store merge per Agarwal et al.'s
    * mergeable-summaries rule, with `total` exact. In the ≤ k-distinct
    * regime no decrement ever fires and stream ≡ batch exactly. The
    * exact-confirm pass stays a batch scan over the landed corpus
    * (`text_heavy_hitters`), exactly as in the batch pipeline.
    *
    * Scale shape: per-batch work is a stateless explode/hash over
    * ARRIVING documents with map-side MG partials (exchange = k longs
    * per task); the aggregation state is ONE ≤ k-counter buffer
    * regardless of corpus size — complete mode is safe because the
    * "result table" is the sketch itself.
    */
  def mgSummary(
      docs: DataFrame,
      k: Int = graft.functions.TextAnalysis.HeavyHitterK): DataFrame =
    graft.functions.TextAnalysis.tokenHashes(docs)
      .agg(graft.functions.MisraGries.mg(k)(col("h")).as("cand"),
        count(lit(1)).as("total"))

  /** Daily event-volume table (day, n) from a batch OR streaming
    * events frame — the ingest-monitor leg of the refresh suite:
    * counts are a SUM-monoid keyed by day, so arriving events fold
    * into calendar-bounded state (one row per day ever seen), and the
    * CUSUM changepoint tail
    * ([[graft.operators.EventAnalytics.cusumOf]]) recomputes over the
    * maintained table on read — calendar-sized work, the same shape
    * the batch `events_changepoint` query runs.
    */
  def dailyVolume(events: DataFrame): DataFrame =
    graft.operators.EventAnalytics.dailyCounts(events)

  /** Start the daily-volume refresh (complete mode into a memory table
    * `queryName`) — same lifecycle as [[start]].
    */
  def startDailyVolume(
      events: DataFrame,
      queryName: String,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(dailyVolume(events), queryName, trigger, checkpoint)

  /** Finest-grain (event_type, day, j, m) user registers from a batch
    * OR streaming events frame — the cell-sketch leg of the refresh
    * suite: arriving events fold into max-monoid register state
    * bounded at types × days × 256 cells, and every report
    * granularity (per type, per day, total) derives from the
    * maintained table by per-register max exactly as the batch
    * `events_hll_cube` rolls up — the sketch-cube lifecycle live.
    */
  def userCellRegisters(events: DataFrame): DataFrame =
    graft.operators.EventAnalytics.userCellRegisters(events)

  /** Start the user-cube register refresh (complete mode into a memory
    * table `queryName`) — same lifecycle as [[start]].
    */
  def startUserCube(
      events: DataFrame,
      queryName: String,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(userCellRegisters(events), queryName, trigger, checkpoint)

  /** BM25 corpus statistics — the retrieval-serving leg of the
    * refresh suite: (n_docs, Σ doc_len, per-term df) are ALL
    * sum-monoids over arriving documents, so the maintained ONE-row
    * state equals the batch aggregate over everything ever seen and
    * the scoring projection (`retrieval_bm25`'s broadcast stats row)
    * serves fresh-corpus scores without re-scanning the landed corpus.
    * State is bounded at one row regardless of corpus size.
    */
  def bm25Stats(docs: DataFrame): DataFrame =
    graft.functions.Retrieval.corpusStats(docs)

  /** Start the BM25-stats refresh (complete mode into a memory table
    * `queryName`) — same lifecycle as [[start]].
    */
  def startBm25Stats(
      docs: DataFrame,
      queryName: String,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(bm25Stats(docs), queryName, trigger, checkpoint)

  /** Start the MG candidate refresh (complete mode into a memory table
    * `queryName`) — same lifecycle as [[start]].
    */
  def startMg(
      docs: DataFrame,
      queryName: String,
      k: Int = graft.functions.TextAnalysis.HeavyHitterK,
      trigger: Option[Trigger] = None,
      checkpoint: Option[String] = None): StreamingQuery =
    startComplete(mgSummary(docs, k), queryName, trigger, checkpoint)
}
