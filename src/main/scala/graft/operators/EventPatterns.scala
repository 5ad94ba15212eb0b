package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import scala.jdk.CollectionConverters._

/** Batch formulations of the reference's four streaming patterns
  * (`guillesd/duckdb-streaming-patterns`), expressed on the `events`
  * test table. Each function is the *query semantics* of a pattern —
  * the streaming machinery lives in [[graft.streaming]]; these batch
  * forms are what the driver's DuckDB oracle checks.
  *
  * Scale notes (100 TB): every query here is a scan → filter →
  * partial/final hash aggregate. The filter and the pruned column set
  * reach the parquet scan (verify with `.explain("formatted")`:
  * `PushedFilters`, `ReadSchema`), and aggregation is map-side partial
  * before the single shuffle on the grouping key. Key cardinality is
  * |users|, so final state is tiny relative to input — the shape that
  * survives a 1000-executor scale-up.
  */
object EventPatterns {

  /** Timestamp literal used as the incremental-processing cutoff in the
    * watermark/merge demos (events span 2024-01-01..2024-01-30).
    */
  private val Cutoff = "2024-01-15 00:00:00"

  /** Pattern 1.1/2 core: per-user click counts + latest activity.
    * Reference: pattern_1_1.py:96-117 (MERGE source select), pattern_2.py:53-57.
    */
  def clickAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("count_of_clicks"),
        max(col("ts")).as("updated_at"))

  /** Pattern 1.1 delta predicate: null-guarded high-watermark range scan
    * `(? IS NULL OR timestamp > ?)` — reference pattern_1_1.py:105.
    * The literal stands in for `SELECT max(updated_at) FROM user_clicks`
    * (pattern_1_1.py:93); in streaming form this is `withWatermark` +
    * update-mode state.
    */
  def watermarkDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val wm = lit(Cutoff).cast("timestamp")
    Tables.events(spark, sfDir)
      .filter(wm.isNull || col("ts") > wm)
      .filter(col("event_type") === "click")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("count_of_clicks"),
        max(col("ts")).as("updated_at"))
  }

  /** Pattern 1.1 MERGE-as-monoid-merge: upsert of a delta aggregate into
    * the existing summary — reference pattern_1_1.py:96-117, whose UPDATE
    * branch adds counts and last-wins the watermark column
    * (pattern_1_1.py:110-112). Without a lakehouse MERGE we use the
    * scalable formulation: `union(target, delta)` then re-aggregate with
    * (sum, max) — a commutative-monoid merge that Catalyst executes as
    * partial+final hash aggregation (no row-at-a-time upsert loop, no
    * driver round-trip; at 100 TB the union is two scans feeding one
    * shuffle on user_id).
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).filter(col("event_type") === "click")
    val cut = lit(Cutoff).cast("timestamp")
    val target = ev.filter(col("ts") <= cut)
      .groupBy("user_id")
      .agg(count(lit(1)).as("count_of_clicks"), max(col("ts")).as("updated_at"))
    val delta = ev.filter(col("ts") > cut)
      .groupBy("user_id")
      .agg(count(lit(1)).as("count_of_clicks"), max(col("ts")).as("updated_at"))
    target.unionAll(delta)
      .groupBy("user_id")
      .agg(
        sum(col("count_of_clicks")).as("count_of_clicks"),
        max(col("updated_at")).as("updated_at"))
  }

  /** Pattern 1.2 CDF increment: the delta aggregate stamped with the
    * snapshot id it was computed up to (`? AS last_snapshot` — reference
    * pattern_1_2.py:104, bound at :118). In streaming form the stamp is
    * the `foreachBatch` batchId.
    */
  def snapshotStamp(spark: SparkSession, sfDir: String): DataFrame =
    clickAgg(spark, sfDir)
      .withColumn("last_snapshot", lit(42))

  /** Pattern 2 staging + re-aggregate: per-batch partial aggregates are
    * appended to a staging table (pattern_2.py:85-90), then the summary
    * is rebuilt with SUM/MAX over staging (pattern_2.py:99-105). Here a
    * day of event time stands in for a micro-batch. This is an explicit
    * two-level (partial → final) aggregation — exactly what Catalyst's
    * HashAggregate partial/final split does internally.
    */
  def stagingReagg(spark: SparkSession, sfDir: String): DataFrame = {
    val staging = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("batch_day"))
      .agg(count(lit(1)).as("partial_clicks"), max(col("ts")).as("partial_updated_at"))
    staging
      .groupBy("user_id")
      .agg(
        sum(col("partial_clicks")).as("count_of_clicks"),
        max(col("partial_updated_at")).as("updated_at"))
  }

  /** Bonus-pattern polled query: top-5 users by click count — reference
    * bonus_pattern.py:50 (`ORDER BY count_of_clicks DESC LIMIT 5`).
    * user_id added as tiebreak so the selected SET is deterministic.
    * Catalyst plans this as TakeOrderedAndProject — per-partition top-K
    * then a K-row merge on the driver, no full sort at scale.
    */
  def topkUsers(spark: SparkSession, sfDir: String): DataFrame =
    clickAgg(spark, sfDir)
      .orderBy(col("count_of_clicks").desc, col("user_id").asc)
      .limit(5)

  /** Bonus-pattern view shape: `SELECT * EXCLUDE message, decode(message)::json`
    * then field extraction (reference bonus_pattern.py:20-36) — here:
    * all event columns except the raw `props` JSON, plus the extracted
    * typed field `k` (`props ->> '$.k'`).
    */
  def viewExcludeJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .drop("props")

  /** Schema-on-read aggregation over the raw `props` JSON column — the
    * P7/P8 surface (reference bonus_pattern.py:22,33-36 `decode()::json`
    * + `->>` extraction) carried all the way into an aggregate: extract
    * the typed field at scan time and fold it per event type, with the
    * permissive-parse null guard counted (T8's log-and-continue
    * discipline made observable). One projection + one bounded-key
    * exchange; the JSON never crosses a shuffle.
    */
  def propsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_unparsed"))

  /** Ingest-path parse: serialize each event to a JSON message and parse
    * it back — the Kafka value codec of every pattern (producer.py:73-78
    * encode; pattern_2.py:46-47 `CAST(value AS STRING)` → `from_json` →
    * `select("data.*")`; pattern_1_1.py:69-70 json.loads + fromisoformat).
    * Output equals the input columns, which is what the oracle checks.
    */
  def parseRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    // JSON (de)serialization is the rare per-row-heavy event query:
    // spread a single-row-group scan across all cores (no-op on
    // multi-file input — see Tables.spread)
    val ev = Tables.spread(spark,
      Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value"))
    val schema = ev.schema
    // default timestampFormat truncates to millis; keep full microseconds
    val fmt = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    ev.select(to_json(struct(ev.columns.map(col): _*), fmt.asJava).as("value"))
      .select(from_json(col("value").cast("string"), schema, fmt).as("data"))
      .select("data.*")
      .filter(col("event_id").isNotNull) // permissive-parse guard (T8)
  }

  /** Watermark read: ungrouped scalar aggregate with null default —
    * reference pattern_1_1.py:93 (`SELECT max(updated_at) FROM user_clicks`)
    * and pattern_1_2.py:93 (`... or 0` Python-side default → COALESCE).
    */
  def scalarWatermark(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .agg(
        coalesce(max(col("ts")), lit("1970-01-01 00:00:00").cast("timestamp")).as("wm"),
        count(lit(1)).as("n_clicks"))

  /** DuckDB-dialect oracle SQL, keyed like [[queries]]. */
  val oracleSql: Map[String, String] = Map(
    "p11_click_agg" ->
      """SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
         FROM events WHERE event_type = 'click' GROUP BY user_id""",
    "p11_watermark_delta" ->
      s"""SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
          FROM events
          WHERE (TIMESTAMP '$Cutoff' IS NULL OR ts > TIMESTAMP '$Cutoff')
            AND event_type = 'click'
          GROUP BY user_id""",
    "p11_merge_upsert" ->
      s"""SELECT user_id, CAST(sum(count_of_clicks) AS BIGINT) AS count_of_clicks,
                 max(updated_at) AS updated_at
          FROM (
            SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
            FROM events WHERE event_type = 'click' AND ts <= TIMESTAMP '$Cutoff'
            GROUP BY user_id
            UNION ALL
            SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
            FROM events WHERE event_type = 'click' AND ts > TIMESTAMP '$Cutoff'
            GROUP BY user_id)
          GROUP BY user_id""",
    "p12_snapshot_stamp" ->
      """SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at,
                42 AS last_snapshot
         FROM events WHERE event_type = 'click' GROUP BY user_id""",
    "p2_staging_reagg" ->
      """SELECT user_id, CAST(sum(partial_clicks) AS BIGINT) AS count_of_clicks,
                max(partial_updated_at) AS updated_at
         FROM (
           SELECT user_id, date_trunc('day', ts) AS batch_day,
                  count(*) AS partial_clicks, max(ts) AS partial_updated_at
           FROM events WHERE event_type = 'click'
           GROUP BY user_id, date_trunc('day', ts))
         GROUP BY user_id""",
    "bonus_topk" ->
      """SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
         FROM events WHERE event_type = 'click' GROUP BY user_id
         ORDER BY count_of_clicks DESC, user_id ASC LIMIT 5""",
    "bonus_view_exclude" ->
      """SELECT event_id, ts, user_id, event_type, value,
                CAST(props ->> '$.k' AS INTEGER) AS k
         FROM events""",
    "p2_parse_roundtrip" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events""",
    "p11_scalar_watermark" ->
      """SELECT coalesce(max(ts), TIMESTAMP '1970-01-01 00:00:00') AS wm,
                count(*) AS n_clicks
         FROM events WHERE event_type = 'click'""",
    "events_props_agg" ->
      """WITH x AS (
           SELECT event_type,
                  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, count(*) AS n_events,
                CAST(sum(k) AS BIGINT) AS sum_k,
                min(k) AS min_k, max(k) AS max_k,
                count(CASE WHEN k IS NULL THEN 1 END) AS n_unparsed
         FROM x GROUP BY event_type""",
  )

  /** Query registry, keyed by pattern + operator (SURVEY.md §2 ids in
    * each function's doc).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p11_click_agg" -> clickAgg _,
    "p11_watermark_delta" -> watermarkDelta _,
    "p11_merge_upsert" -> mergeUpsert _,
    "p12_snapshot_stamp" -> snapshotStamp _,
    "p2_staging_reagg" -> stagingReagg _,
    "bonus_topk" -> topkUsers _,
    "bonus_view_exclude" -> viewExcludeJson _,
    "p2_parse_roundtrip" -> parseRoundtrip _,
    "p11_scalar_watermark" -> scalarWatermark _,
    "events_props_agg" -> propsAgg _,
  )
}
