package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for large-scale corpus preparation, over the
  * `documents` table: exact (content-hash groupBy), n-gram Jaccard,
  * MinHash + LSH banding, and SimHash.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-groupBy — a single shuffle on a 128-bit
  *    content hash, no data skew (hashes are uniform).
  *  - Near-dup candidate generation NEVER does an O(n²) cross join:
  *    candidates come from equi-joins on blocking keys (shared shingle,
  *    shared LSH band signature, shared SimHash chunk). The shingle
  *    join is bounded by a document-frequency cap
  *    ([[DefaultMaxShingleDf]]): shingles appearing in more than `cap`
  *    docs (boilerplate) are dropped before the self-join, so join
  *    output is ≤ |shingles| × cap — linear in corpus size even with
  *    adversarial boilerplate. The MinHash/LSH and SimHash paths have
  *    fixed fan-out (16 hashes / 4 bands / 4 chunks per doc) by
  *    construction.
  *  - All hashing is MD5-derived so the DuckDB oracle can reproduce
  *    values bit-for-bit. In production the same pipeline would use
  *    `xxhash64(shingle, seed_i)` — one cheap 64-bit hash per seed —
  *    without changing any of the dataflow.
  */
object Dedup {

  /** Distinct word 5-gram shingle array per doc (docs shorter than 5
    * words get null, matching the oracle's empty comprehension).
    */
  private def shingleArray: Column = {
    val ws = split(col("text"), " ")
    val sh = transform(
      sequence(lit(1), size(ws) - 4),
      i => array_join(slice(ws, i, lit(5)), " "))
    when(size(ws) >= 5, array_distinct(sh))
  }

  /** One row per (doc, shingle). */
  private def shingles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingleArray).as("shingle"))

  /** MinHash signatures of ANY (doc_id, text) frame — the signature
    * expression factored out of [[minhashSignatures]] so the batch
    * index build and the streaming index REFRESH
    * ([[graft.streaming.CorpusPrep.startIndexRefresh]]) compute
    * bit-identical signatures and cannot drift. Signatures are per-doc
    * (no cross-document dependency), which is exactly why incremental
    * maintenance is sound: a batch of new documents appends its own
    * rows and touches nothing else.
    */
  private[graft] def signaturesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingleArray).as("shingle"))
      .groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0|"), col("shingle")))).as("mh0"),
        (1 until NumHashes).map(i =>
          min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"mh$i")): _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("mhs"))

  /** Exact dedup: group by content hash; keeper = lowest doc_id.
    * One shuffle on md5(text).
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Shingles with document frequency above this are dropped before the
    * candidate self-join: one boilerplate shingle (a shared header, a
    * license block) otherwise produces df² candidate pairs and the join
    * goes quadratic at corpus scale. With the cap, join output is
    * ≤ |shingles| × cap — linear. Jaccard for pairs that share a dropped
    * shingle is a lower bound (set sizes stay uncapped), the standard
    * near-dup tradeoff: boilerplate overlap shouldn't count as
    * similarity anyway.
    */
  val DefaultMaxShingleDf = 128

  /** N-gram Jaccard near-dup pairs: df-capped shingle equi-join →
    * per-pair intersection count → |A∩B| / (|A|+|B|−|A∩B|) ≥ 0.5.
    *
    * Plan shape and why:
    *  - Shingle strings collapse to 64-bit `xxhash64` keys right after
    *    the explode — every downstream exchange carries 20-byte rows
    *    (hash, doc_id, sz) instead of full n-gram text. Hash equality
    *    stands in for string equality (a 2⁻⁶⁴ collision would need two
    *    colliding shingles in the same doc pair to perturb one
    *    intersection count — negligible at any corpus size, and the
    *    same trade every shingle-blocking dedup pipeline makes).
    *  - The df-cap is a count-groupBy over the hash keys (map-side
    *    partial aggregation collapses even a million-doc hot shingle
    *    to one row per partition — no skew, no OOM) followed by an
    *    ANTI join. The hot set is almost always tiny (it's the
    *    boilerplate) and AQE broadcasts it from runtime stats — but
    *    no hint, because adversarial data can make it grow.
    *  - Candidates come from the capped self-join: output is bounded
    *    by |shingles| × cap, linear in corpus size.
    */
  /** The exploded (doc, shingle-hash) table, memoized per (session,
    * dir) and persisted DISK_ONLY: the df-cap count and both self-join
    * sides read it, so without persistence the shingle pipeline
    * executes once per reference — but the frame is CORPUS-sized
    * (≈ |words| rows), so under the storage-level rule
    * ([[graft.ext.Similarity.bucketedEmb]] scaladoc) it must never pin
    * executor memory; local disk re-reads at scan speed, exactly like
    * the shuffle files next to it. With [[graft.IndexStore.IndexDirKey]]
    * set, the frame is instead checkpointed ONCE to the warehouse as a
    * catalog table bucketed on the shingle-hash join key — the
    * long-lived-pipeline lifecycle where reuse survives the session.
    */
  private val shingleCache = new graft.SessionCache[DataFrame]

  private[graft] def explodedShingleHashes(spark: SparkSession, sfDir: String): DataFrame =
    shingleCache.getOrElseUpdate(spark, sfDir) {
      graft.functions.expressions.GraftFunctions.register(spark)
      import graft.functions.expressions.GraftFunctions.shingleHashes
      // set size rides along with each exploded row, so the pair
      // aggregation needs no extra size-lookup joins afterwards.
      // shingle_hashes is the native one-pass kernel — see
      // expressions/ShingleHashes.scala for the equivalence proof vs
      // the declarative transform/array_join/xxhash64 composition.
      // Attach each shingle's document frequency AT BUILD TIME (r18):
      // the df-capped consumers (ngramJaccard, containmentPairs, the
      // recallEval truth side) previously re-ran a corpus-grain
      // census + anti-join PER QUERY to find hot shingles — a full
      // pass over the exploded index each time (guide §1.2: the
      // index should carry what every consumer recomputes).
      // SKEW-GUARDED form (r19, guide §2.2/§2.5): r18 computed df as
      // count(1) OVER (PARTITION BY h), which buffers every row of
      // one shingle hash in a single task's window group — a
      // stopword-grade hot shingle at 100 TB is millions of rows in
      // one window buffer/spill, where a groupBy census is
      // partial-aggregated map-side with constant per-key state.
      // The census+join form needs the exploded frame TWICE; naive
      // recomputation doubles the shingle-kernel pass (measured 6×
      // slower at sf1 in r18), and exchange-subtree reuse dies to
      // column pruning (the census branch plans a narrower scan → no
      // ReusedExchange). So PERSIST the exploded frame once
      // (DISK_ONLY — corpus-sized, the storage-level rule; released
      // after the warehouse write), census from the cache (map-side
      // partials → the exchange carries per-partition distinct h,
      // never corpus rows), join back on the cache riding the explicit
      // hash(h) clustering the bucketed write needs anyway
      // (prePartitioned). The hot key costs a streaming count + hash
      // probe, never a buffer.
      val exM = Tables.documents(spark, sfDir)
        .select(col("doc_id"), shingleHashes(col("text")).as("hs"))
        .select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      def build = {
        val census = exM.groupBy("h").agg(count(lit(1)).as("df"))
        exM.repartition(graft.IndexStore.DefaultBuckets, col("h"))
          .join(census, Seq("h")).select("doc_id", "sz", "h", "df")
      }
      graft.IndexStore.resolve(spark, sfDir, "shingle_hashes", Some("h"),
          prePartitioned = true)(build) match {
        case Some(table) =>
          // the warehouse table is written (or already existed): the
          // scratch cache has served its one build and is released
          exM.unpersist()
          table
        case None =>
          build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      }
    }

  def ngramJaccard(spark: SparkSession, sfDir: String,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // df rides the persisted index (attached at build) — the cap is a
    // scanned-column filter, not a per-query census + anti-join
    val kept = explodedShingleHashes(spark, sfDir)
      .filter(col("df") <= maxShingleDf)
    val l = kept.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("h"))
    val r = kept.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("h").as("h_r"))
    // no join hint: at bench scale the size-based planner broadcasts
    // the capped side (measured faster than a shuffled-hash join
    // here); at corpus scale the exploded table exceeds any broadcast
    // threshold and the same code plans the shuffle join it must be
    l.join(r, col("h") === col("h_r") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Reconstructed corpus after span dedup — the ACTIONABLE form of
    * [[spanDedup]]: each document reassembled from only its kept
    * spans, in span order; documents whose every span was seen earlier
    * disappear entirely (they contributed nothing novel). This is the
    * C4-pipeline write-back step: the flag relation says WHAT was
    * duplicate, this emits the cleaned text a training run consumes.
    *
    * Scale note: unlike [[spanDedup]] (hashes only on every exchange),
    * reconstruction necessarily moves span TEXT through the final
    * doc-grain aggregation — that exchange is output-sized (the
    * cleaned corpus itself), which is the floor for any operator whose
    * result IS the text. The first-occurrence resolution still runs
    * entirely on 64-bit hashes.
    */
  def spanDedupClean(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val spans = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((size(ws) - 1) / SpanTokens).cast("int")),
          i => array_join(slice(ws, i * SpanTokens + 1, lit(SpanTokens)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
        col("col").as("span"), xxhash64(col("col")).as("h"))
    val firsts = spans.groupBy("h")
      .agg(min(col("doc_id") * SpanIdxCap + col("span_idx")).as("first_key"))
    spans.join(firsts, "h")
      .filter(col("doc_id") * SpanIdxCap + col("span_idx") === col("first_key"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept_spans"),
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"))
  }

  /** Containment floor for [[containmentPairs]]. */
  private val ContainmentFloor = 0.8

  /** Asymmetric containment pairs — the subset-inclusion detector
    * Jaccard structurally misses: C(A,B) = |A∩B| / min(|A|,|B|), the
    * fraction of the SMALLER document's shingles present in the
    * larger. A 50-shingle quote pasted whole into a 1000-shingle page
    * scores J = 50/1000 ≈ 0.05 (invisible to [[ngramJaccard]]'s 0.5
    * floor) but C = 1.0 — exactly the wholesale-inclusion case a
    * training pipeline must catch before computing per-doc novelty.
    *
    * Plan shape: identical to [[ngramJaccard]] — same memoized
    * [[explodedShingleHashes]] index, same df-capped blocking
    * self-join, same map-side intersection count; only the final
    * per-pair arithmetic differs (min instead of union), so every
    * scale argument there carries over verbatim. Determinism: one
    * integer division per surviving pair — identical IEEE operands in
    * both engines.
    */
  def containmentPairs(spark: SparkSession, sfDir: String,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // same df-from-index discipline as [[ngramJaccard]]
    val kept = explodedShingleHashes(spark, sfDir)
      .filter(col("df") <= maxShingleDf)
    val l = kept.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("h"))
    val r = kept.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("h").as("h_r"))
    l.join(r, col("h") === col("h_r") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= ContainmentFloor)
      .select("doc_a", "doc_b", "containment")
  }

  /** Jaccard floor for [[allPairsExact]] as an exact fraction 4/5 —
    * kept rational so the threshold predicate is pure BIGINT
    * arithmetic (`5·inter ≥ 4·union`) in both engines.
    */
  private[graft] val AllPairsNum = 4L
  private[graft] val AllPairsDen = 5L

  /** Exact all-pairs similarity self-join with prefix filtering
    * (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    * WWW 2007) — EVERY document pair with shingle-set Jaccard ≥ 4/5,
    * with a completeness GUARANTEE. This is the contract the rest of
    * the dedup suite trades away: [[ngramJaccard]] drops shingles above
    * a df cap (pairs whose overlap lives in boilerplate vanish) and
    * [[minhashLsh]] is probabilistic (banding misses pairs near the
    * threshold); legal-grade dedup (license compliance, eval-set
    * contamination audits) needs the no-false-negative version.
    *
    * The filter theorem: order the universe totally (here by
    * (df, hash) — rarest first) and give each size-s set the prefix of
    * its first `s − ⌈t·s⌉ + 1` elements. If J(x,y) ≥ t, the smallest
    * common element of x∩y must sit in BOTH prefixes (if it sat past
    * x's prefix, the overlap would fit in x's last ⌈t·s⌉−1 slots,
    * contradicting |x∩y| ≥ t·|x∪y| ≥ t·s). So the prefix-prefix
    * equi-join loses nothing, and exact verification over the
    * candidates reproduces brute force bit-for-bit — which is why the
    * ORACLE is plain brute force and the plan's prefix machinery is
    * invisible in the result.
    *
    * Scale shape vs the brute-force self-join it replaces:
    *  - the inverted index holds only prefixes — ≈ (1−t)·|x|+1 rows
    *    per doc, a 5× smaller join input at t = 4/5;
    *  - rarest-first ordering self-mitigates the hub problem: a
    *    boilerplate shingle enters a doc's prefix only when it is
    *    among that doc's RAREST fifth, so corpus-wide hot keys sort
    *    out of almost every prefix (the df-cap's job, without losing
    *    completeness);
    *  - the size filter `5·min(sz) ≥ 4·max(sz)` prunes cross-size
    *    candidates inside the join condition;
    *  - per-doc ordering is an embarrassingly parallel in-array sort
    *    (no corpus-grain window/sort); verification joins the bounded
    *    candidate pairs back to per-doc hash arrays and intersects
    *    in-memory per row.
    * All arithmetic is BIGINT (ppm output, rational threshold), so
    * cross-engine bit-equality needs no float discipline.
    */
  def allPairsExact(spark: SparkSession, sfDir: String): DataFrame = {
    val (prefixes, docSets) = allPairsIndex(spark, sfDir)
    allPairsJoin(prefixes, docSets)
  }

  /** The two halves of the AllPairs index, persisted train-once with
    * the warehouse attached: the per-doc sorted sets (bucketed on
    * doc_id, the verify-join key) and the prefix inverted index
    * (bucketed on h, so the candidate self-join co-locates without an
    * exchange) — incremental dedup then serves new docs against these
    * tables without re-deriving the corpus order. Cold, both derive
    * inline from the shingle index.
    */
  private val allPairsSetsCache = new graft.SessionCache[DataFrame]

  private[graft] def allPairsIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // cold (no warehouse) the sets frame memoizes DISK_ONLY: four
    // subtrees of the join reference it (both prefix sides, both
    // verify sides) and Spark plans common subexpressions
    // independently — without this the collect_list aggregation runs
    // once per subtree
    val docSets = allPairsSetsCache.getOrElseUpdate(spark, sfDir) {
      def build = allPairsDocSets(explodedShingleHashes(spark, sfDir))
      graft.IndexStore
        .resolve(spark, sfDir, "allpairs_sets", Some("doc_id"))(build)
        .getOrElse(build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    }
    val prefixes = graft.IndexStore
      .resolve(spark, sfDir, "allpairs_prefix", Some("h"))(allPairsPrefixes(docSets))
      .getOrElse(allPairsPrefixes(docSets))
    (prefixes, docSets)
  }

  /** The AllPairs core over any (doc_id, sz, h) exploded set frame
    * (one row per distinct element per doc, `sz` the doc's set size) —
    * factored from [[allPairsExact]] so adversarial fixtures (hot
    * boilerplate keys, tiny identical docs) can pin the prefix-filter
    * completeness proof on the real operator.
    */
  private[graft] def allPairsExactOn(ex: DataFrame): DataFrame = {
    val docSets = allPairsDocSets(ex)
    allPairsJoin(allPairsPrefixes(docSets), docSets)
  }

  /** Incremental exact all-pairs — the ARRIVING-TRANCHE form of
    * [[allPairsExact]], completing the lifecycle the persisted
    * [[allPairsIndex]] exists for (the [[incrementalDedup]] story with
    * a completeness guarantee instead of a MinHash estimate): when a
    * new tranche lands, its prefixes join against the WHOLE prefix
    * index but the old×old side never re-pairs. "New" is the corpus's
    * id-topmost tenth, cutoff derived from the data exactly as in
    * [[incrementalDedup]].
    *
    * Completeness carries over asymmetrically for free: pairs order as
    * doc_a < doc_b and the tranche holds the LARGEST ids, so every
    * pair involving a new doc has its doc_b side in the tranche — one
    * filtered right side covers new×old and new×new alike, and the
    * prefix theorem needs nothing new (both endpoints still contribute
    * their full prefixes). Candidate work is |tranche|·occupancy, not
    * |corpus|·occupancy.
    */
  def allPairsIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val (prefixes, docSets) = allPairsIndex(spark, sfDir)
    val cut = Tables.documents(spark, sfDir)
      .agg((max(col("doc_id")) + 1 - expr("count(1) div 10")).as("cutoff"))
    val tranche = prefixes.crossJoin(broadcast(cut))
      .filter(col("doc_id") >= col("cutoff"))
      .select("doc_id", "sz", "h")
    allPairsVerify(allPairsCandidates(prefixes, tranche), docSets)
  }

  /** The ARRIVING-TRANCHE core of [[allPairsIncremental]] over any
    * (doc_id, sz, h) exploded set frame — factored (like
    * [[allPairsExactOn]]) so the release-lifecycle composition can be
    * pinned on fixtures: only pairs whose id-larger endpoint is
    * ≥ `cutoff` come out, and (old-corpus [[allPairsExactOn]]) ∪ (this
    * over the full frame) must equal full-corpus [[allPairsExactOn]]
    * EXACTLY — the prefix theorem's completeness survives the
    * asymmetric join because both endpoints still contribute their
    * full prefixes, and verification is order-independent.
    */
  private[graft] def allPairsIncrementalOn(ex: DataFrame, cutoff: Long): DataFrame = {
    val docSets = allPairsDocSets(ex)
    val prefixes = allPairsPrefixes(docSets)
    allPairsVerify(
      allPairsCandidates(prefixes, prefixes.filter(col("doc_id") >= cutoff)),
      docSets)
  }

  /** Per-doc sets sorted rarest-first by the (df, h) total order; the
    * sort is per-row array work after one doc-grain aggregation.
    */
  private def allPairsDocSets(ex: DataFrame): DataFrame = {
    // the persisted shingle index already carries df (attached at
    // build); fixture frames without it pay the census inline
    val withDf =
      if (ex.columns.contains("df")) ex
      else ex.join(ex.groupBy("h").agg(count(lit(1)).as("df")), "h")
    withDf
      .groupBy("doc_id", "sz")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("toks"))
  }

  /** The prefix inverted index — each doc's rarest `sz − ⌈t·sz⌉ + 1`
    * elements, exploded to (doc_id, sz, h) rows.
    */
  private def allPairsPrefixes(docSets: DataFrame): DataFrame =
    docSets.select(col("doc_id"), col("sz"),
      explode(slice(col("toks"), lit(1),
        expr(s"CAST(sz - (sz * $AllPairsNum + ${AllPairsDen - 1}) DIV $AllPairsDen + 1 AS INT)")))
        .as("p"))
      .select(col("doc_id"), col("sz"), col("p.h").as("h"))

  private def allPairsJoin(prefixes: DataFrame, docSets: DataFrame): DataFrame =
    allPairsVerify(allPairsCandidates(prefixes, prefixes), docSets)

  /** Prefix-prefix candidate join; the right side may be a filtered
    * tranche of the index (the incremental form), in which case the
    * candidates cover exactly the pairs whose id-LARGER endpoint is in
    * the tranche.
    */
  private def allPairsCandidates(left: DataFrame, right: DataFrame): DataFrame =
    left.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("h"))
      .join(right.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
        col("h").as("h_r")),
        col("h") === col("h_r") && col("doc_a") < col("doc_b") &&
          least(col("sz_a"), col("sz_b")) * AllPairsDen >=
            greatest(col("sz_a"), col("sz_b")) * AllPairsNum)
      .select("doc_a", "doc_b").distinct()

  /** Exact verification of candidate (doc_a, doc_b) pairs against the
    * per-doc hash arrays; emits only pairs at or above the 4/5 floor.
    */
  private def allPairsVerify(cand: DataFrame, docSets: DataFrame): DataFrame = {
    val sets = docSets.select(col("doc_id"), col("sz"),
      expr("transform(toks, t -> t.h)").as("hs"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
        col("hs").as("hs_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
        col("hs").as("hs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("inter"),
        (col("sz_a") + col("sz_b")).cast("long").as("szsum"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("szsum") - col("inter")).as("uni"))
      .filter(col("inter") * AllPairsDen >= col("uni") * AllPairsNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        expr("inter * 1000000 div uni").as("jaccard_ppm"))
  }

  /** Fingerprint document-frequency cap and minimum shared-fingerprint
    * threshold for [[winnowPairs]] — same roles as
    * [[DefaultMaxShingleDf]] / the Jaccard floor in [[ngramJaccard]].
    */
  private[graft] val WinnowDfCap = 64
  private[graft] val WinnowMinShared = 2L

  /** Cached per-corpus winnowing fingerprints (corpus-sized ⇒
    * DISK_ONLY under the storage-level rule, or warehouse-bucketed on
    * the join key with [[graft.IndexStore.IndexDirKey]] set — the same
    * lifecycle as [[explodedShingleHashes]]).
    */
  private val winnowCache = new graft.SessionCache[DataFrame]

  private[graft] def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    winnowCache.getOrElseUpdate(spark, sfDir) {
      // df attached at build exactly like [[explodedShingleHashes]]:
      // [[winnowPairs]] filters the scanned column instead of
      // re-running a fingerprint census + anti-join per query. Same
      // r19 skew guard as the shingle index: persist the fingerprint
      // frame once, partial-agg census from the cache, join back
      // riding the bucketed write's hash(fingerprint) clustering — no
      // per-key window buffer, no doubled winnow pass.
      val fpM = graft.functions.TextAnalysis.winnow(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      def build = {
        val census = fpM.groupBy("fingerprint").agg(count(lit(1)).as("df"))
        fpM.repartition(graft.IndexStore.DefaultBuckets, col("fingerprint"))
          .join(census, Seq("fingerprint"))
          .select("doc_id", "fingerprint", "df")
      }
      graft.IndexStore.resolve(spark, sfDir, "winnow_fp", Some("fingerprint"),
          prePartitioned = true)(build) match {
        case Some(table) => fpM.unpersist(); table
        case None =>
          build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      }
    }

  /** Partial-overlap near-dup pairs over WINNOWING fingerprints
    * ([[graft.functions.TextAnalysis.winnow]]) — the inverted-index
    * join MOSS runs: two documents pair when they share ≥
    * [[WinnowMinShared]] fingerprints, i.e. (by the winnowing
    * guarantee) when they share token runs of length k+w−1. This
    * catches LOCAL overlap — a copied paragraph inside otherwise
    * unrelated documents — that whole-document MinHash/Jaccard
    * dilutes below threshold.
    *
    * Scale shape is [[ngramJaccard]]'s: fingerprints whose document
    * frequency exceeds [[WinnowDfCap]] are dropped before the
    * self-join (boilerplate selections would otherwise square), so
    * join output is ≤ |fingerprints|·cap — linear in the corpus, never
    * all-pairs; the pair aggregation is map-side partial over 24-byte
    * rows.
    */
  def winnowPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // df rides the persisted index (attached at build) — the cap is a
    // scanned-column filter, not a per-query census + anti-join
    val kept = winnowFingerprints(spark, sfDir)
      .filter(col("df") <= WinnowDfCap)
    val l = kept.select(col("fingerprint"), col("doc_id").as("doc_a"))
    val r = kept.select(col("fingerprint").as("fp_r"), col("doc_id").as("doc_b"))
    l.join(r, col("fingerprint") === col("fp_r") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= WinnowMinShared)
  }

  /** Cross-source contamination matrix — the provenance audit a
    * multi-source corpus runs before mixing ratios are trusted: for
    * every source pair, how many distinct winnowing fingerprints they
    * share. A hot cell means two "independent" sources carry the same
    * passages (mirror sites, scraped re-posts), which silently
    * double-weights that content under any per-source sampling policy
    * ([[graft.operators.Advanced.sampleTemperature]] et al).
    *
    * Scale shape: the corpus-sized work is one `(source, fingerprint)`
    * DISTINCT over the shared memoized [[winnowFingerprints]] frame
    * (one hashed exchange of 16-byte rows); the self-join then runs on
    * source-grain rows — fan-out per fingerprint is bounded by the
    * SOURCE count (tens, not documents), so no df-cap is needed and
    * the pair aggregation output is |sources|² cells.
    */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = winnowFingerprints(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val srcFp = fp.join(docs, "doc_id").select("source", "fingerprint").distinct()
    val l = srcFp.select(col("fingerprint"), col("source").as("src_a"))
    val r = srcFp.select(col("fingerprint").as("fp_r"), col("source").as("src_b"))
    l.join(r, col("fingerprint") === col("fp_r") && col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared_fps"))
  }

  /** Stand-in benchmark set for [[decontaminate]]: docs with id below
    * this. Production passes the real eval suite as the second table —
    * the dataflow is identical.
    */
  val BenchmarkDocs = 25

  /** Benchmark decontamination — the eval-overlap pass every serious
    * training pipeline runs before a data release: for each corpus
    * document, how many of its distinct 5-gram shingles also appear in
    * the benchmark set (here: docs `doc_id <` [[BenchmarkDocs]]).
    * Downstream filters drop or redact docs whose overlap fraction
    * exceeds a threshold; emitting the raw integer counts keeps the
    * policy out of the operator and the cross-engine compare exact.
    *
    * Scale design: the benchmark shingle set is DISTINCT'd and tiny
    * relative to the corpus (eval suites are fixed-size) — the planner
    * broadcasts it from size stats / AQE, no hint, so the corpus is
    * scanned once and never shuffled for the join. Shingles collapse to
    * 64-bit xxhash64 via the one-pass [[graft.functions.expressions.ShingleHashes]]
    * kernel before the join (hash equality stands in for string
    * equality — same 2⁻⁶⁴ trade as [[ngramJaccard]]). The per-doc
    * aggregation partial-aggregates map-side (explode preserves row
    * locality), so its exchange carries ~one row per document.
    */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(spark)
    import graft.functions.expressions.GraftFunctions.shingleHashes
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleHashes(col("text")).as("hs"))
    val bench = docs.filter(col("doc_id") < BenchmarkDocs)
      .select(explode(col("hs")).as("h")).distinct()
      .withColumn("hit", lit(1))
    docs
      .select(col("doc_id"), coalesce(size(col("hs")), lit(0)).as("n_shingles"),
        explode_outer(col("hs")).as("h")) // outer: short docs still emit
      .join(bench, Seq("h"), "left")
      .groupBy("doc_id", "n_shingles")
      .agg(count(col("hit")).cast("int").as("n_contaminated"))
      .select("doc_id", "n_shingles", "n_contaminated")
  }

  /** The release pipeline's TRAIN-ONCE view of [[decontaminate]] —
    * (doc_id, n_shingles, n_contaminated) verdicts, memoized
    * in-session and warehouse-persisted bucketed on doc_id under
    * [[graft.IndexStore.IndexDirKey]], exactly like [[dupComponents]]:
    * a production release computes its contamination census once per
    * (corpus, benchmark) and every release-side consumer
    * ([[graft.operators.Advanced.corpusPrepFull]] / `corpusPrepGated`
    * / `corpusDropReasons` and both release cards) reads the persisted
    * verdicts instead of re-running the corpus-grain shingle pass per
    * query (guide §1.2/§2.4 — r19, VERDICT #5). The declared
    * `decontaminate` query itself still computes the live operator —
    * it IS the census; this artifact is its once-per-release output.
    */
  private val contamCache = new graft.SessionCache[DataFrame]

  private[graft] def contamCounts(spark: SparkSession, sfDir: String): DataFrame =
    contamCache.getOrElseUpdate(spark, sfDir) {
      def build = decontaminate(spark, sfDir)
      graft.IndexStore.resolve(spark, sfDir, "contam_counts", Some("doc_id"))(build)
        .getOrElse(build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    }

  /** Span width (tokens) for [[spanDedup]]. */
  private val SpanTokens = 16

  /** Packing radix for the (doc_id, span_idx) → long first-occurrence
    * key in [[spanDedup]]: supports 2²⁰ spans per doc (a 16M-token
    * document) and doc ids up to 2⁴³ — both documented contract
    * bounds, checked nowhere because violating either means the corpus
    * layout itself changed.
    */
  private val SpanIdxCap = 1L << 20

  /** Span-level exact dedup — the C4/RefinedWeb line-dedup shape at
    * span granularity: the corpus is cut into non-overlapping
    * 16-token spans (last span may be short) and every span that
    * already occurred earlier in the corpus — ordered by (doc_id,
    * span_idx) — is marked dropped; the first occurrence is kept.
    * Whole-doc dedup ([[exact]]) misses a boilerplate paragraph pasted
    * into thousands of otherwise-distinct pages; span dedup removes
    * exactly those repeats while keeping each document's novel text.
    *
    * Scale shape: spans collapse to 64-bit `xxhash64` keys immediately
    * (strings never cross an exchange — the [[ngramJaccard]]
    * discipline); first-occurrence is `min` over the PACKED long
    * `doc_id·2²⁰ + span_idx` — a plain mutable-buffer hash aggregate,
    * where a `min(struct(...))` would plan a SortAggregate and sort
    * every span row per partition — and the keep flag is one equality
    * against the group's packed minimum. Both the aggregate and the
    * join key on the same hash, so AQE plans one co-partitioned
    * exchange pair; output rows are (doc_id, span_idx, bool) — corpus
    * token count / 16 rows of three scalars.
    */
  def spanDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val spans = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((size(ws) - 1) / SpanTokens).cast("int")),
          i => array_join(slice(ws, i * SpanTokens + 1, lit(SpanTokens)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
        xxhash64(col("col")).as("h"))
    val firsts = spans.groupBy("h")
      .agg(min(col("doc_id") * SpanIdxCap + col("span_idx")).as("first_key"))
    spans.join(firsts, "h")
      .select(col("doc_id"), col("span_idx"),
        (col("doc_id") * SpanIdxCap + col("span_idx") === col("first_key")).as("kept"))
  }

  /** Bloom sizing for [[decontaminateBloom]]: bits per benchmark key
    * (m/n = 16 with k = 8 hash probes → false-positive rate ≈ 4·10⁻⁴)
    * and probe count. The false-positive rate only tunes how much work
    * reaches the exact confirm join — never the answer.
    */
  private val BloomBitsPerKey = 16L
  private val BloomNumHashes = 8

  /** Bloom-prefiltered decontamination — the same answer as
    * [[decontaminate]], computed the way a 100 TB deployment has to
    * when the benchmark shingle set outgrows an exact broadcast set:
    * through a Bloom filter whose bits are ~m/n·(1/64) the size of the
    * exact 64-bit hash set (16 bits vs 64 bits per key here, and the
    * gap widens when the exact set must store strings).
    *
    * The filter is built AS DATA, the [[graft.ext.Similarity.ivfTopK]]
    * quantizer discipline — no driver-side collect, no UDF:
    *  1. benchmark shingle hashes fan out to k=8 bit positions
    *     (`xxhash64(h, seed)` mod m) and fold into per-word `bit_or`
    *     masks — a distributed build whose exchange is bitmap-sized,
    *  2. the masks collapse into ONE dense `array<long>` row,
    *     broadcast to every task through a 1-row cross join,
    *  3. the corpus-side probe is 8 codegen'd element_at/shift/mask
    *     checks per shingle — no join, no shuffle for the prefilter,
    *  4. only bloom-positive shingles carry a non-null key into the
    *     exact confirm join, so its shuffle is sized by the TRUE
    *     contamination volume plus the ~4·10⁻⁴ false-positive trickle,
    *     not by the corpus.
    * Bloom filters have no false negatives, so the confirm join sees
    * every truly contaminated shingle and the output is bit-identical
    * to [[decontaminate]] — the oracle is literally the same SQL.
    */
  /** Memoized bloom INDEX for [[decontaminateBloom]] — (1-row bitmap
    * frame, bit width). Build is an index phase like [[lshIndex]]
    * (one exact count + one fold over the fixed-size benchmark set);
    * without memoization every execution rebuilt the bitmap, which the
    * round-5 verdict's build-vs-serve split exists to prevent. The
    * bitmap row is bounded (m/64 longs, benchmark-sized) so a
    * memory-backed level is allowed under the storage-level rule.
    */
  private val bloomCache = new graft.SessionCache[(DataFrame, Long)]

  private[graft] def bloomIndex(spark: SparkSession, sfDir: String): (DataFrame, Long) =
    bloomCache.getOrElseUpdate(spark, sfDir) {
      graft.functions.expressions.GraftFunctions.register(spark)
      import graft.functions.expressions.GraftFunctions.shingleHashes
      val bench = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < BenchmarkDocs)
        .select(explode(shingleHashes(col("text"))).as("h")).distinct()
      // size the bitmap from the benchmark's exact cardinality (one
      // count over the fixed-size benchmark — amortized with the index)
      val nKeys = math.max(1L, bench.count())
      val mBits = math.max(1024L,
        java.lang.Long.highestOneBit(nKeys * BloomBitsPerKey - 1) << 1)
      val nWords = (mBits / 64).toInt
      val words = bench
        .select(explode(array((0 until BloomNumHashes).map(i =>
          pmod(xxhash64(col("h"), lit(i)), lit(mBits))): _*)).as("pos"))
        .groupBy((col("pos") / lit(64L)).cast("int").as("w"))
        .agg(bit_or(expr("shiftleft(1L, cast(pos % 64 as int))")).as("mask"))
      val bitsRow = words
        .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bm"))
        .select(transform(sequence(lit(0), lit(nWords - 1)),
          w => coalesce(element_at(col("bm"), w), lit(0L))).as("bits"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (bitsRow, mBits)
    }

  /** The k-probe Bloom membership test as a COLUMN expression — bit
    * `pmod(xxhash64(h,i), m)` of the dense `bits` word array, for all
    * [[BloomNumHashes]] probes — factored so the batch
    * [[decontaminateBloom]] confirm path and the streaming ingest gate
    * ([[graft.streaming.CorpusPrep.startDecontaminated]]) evaluate the
    * IDENTICAL probe and cannot drift. Column-parameterized (not an
    * expr string) so it composes inside higher-order-function lambdas;
    * the variable-distance shift goes through `call_function` because
    * the Scala `shiftright` helper only takes a literal distance.
    */
  private[graft] def bloomProbe(bits: Column, mBits: Long)(h: Column): Column =
    (0 until BloomNumHashes).map { i =>
      val pos = pmod(xxhash64(h, lit(i)), lit(mBits))
      (call_function("shiftright",
        element_at(bits, (pos / lit(64)).cast("int") + 1),
        pmod(pos, lit(64)).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)

  def decontaminateBloom(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(spark)
    import graft.functions.expressions.GraftFunctions.shingleHashes
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleHashes(col("text")).as("hs"))
    val bench = docs.filter(col("doc_id") < BenchmarkDocs)
      .select(explode(col("hs")).as("h")).distinct()
    val (bitsRow, mBits) = bloomIndex(spark, sfDir)
    val mightContain = bloomProbe(col("bits"), mBits)(col("h"))
    val benchHits = bench.withColumn("hit", lit(1))
    docs
      .select(col("doc_id"), coalesce(size(col("hs")), lit(0)).as("n_shingles"),
        explode_outer(col("hs")).as("h")) // outer: short docs still emit
      .crossJoin(broadcast(bitsRow))
      .select(col("doc_id"), col("n_shingles"),
        when(mightContain, col("h")).as("h")) // bloom-negative → null key → no match
      .join(benchHits, Seq("h"), "left")
      .groupBy("doc_id", "n_shingles")
      .agg(count(col("hit")).cast("int").as("n_contaminated"))
      .select("doc_id", "n_shingles", "n_contaminated")
  }

  private[graft] val NumHashes = 16
  private val NumBands = 4 // 4 rows per band

  /** MinHash signatures + LSH banding: 16 min-hashes per doc (min over
    * shingles of md5(i ++ "|" ++ shingle)), banded 4×4; candidate pairs
    * share a band signature; estimated Jaccard = fraction of agreeing
    * minhash positions. Fixed per-doc fan-out ⇒ linear scaling.
    */
  /** MinHash signature table, memoized per (session, dir): referenced
    * 4× downstream (band self-join sides + both estimate-join lookups)
    * and by [[editDistConfirm]]'s composition on top. Rows are
    * per-DOC fixed width (doc_id + 16 hashes) — narrower than the
    * corpus by the average document length — but row count still
    * scales with the corpus, so the storage-level rule
    * ([[graft.ext.Similarity.bucketedEmb]]) applies: DISK_ONLY.
    * With [[graft.IndexStore.IndexDirKey]] set the signatures persist
    * to the warehouse instead, bucketed on doc_id (the estimate-join
    * key), and later sessions reuse them scan-only.
    */
  private val sigCache = new graft.SessionCache[DataFrame]

  private[graft] def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    sigCache.getOrElseUpdate(spark, sfDir) {
      // All 16 minhashes are computed as 16 independent min() aggregates
      // over the exploded shingle rows in ONE groupBy — every md5/concat/
      // min stays inside whole-stage codegen, and the plan has a single
      // exchange before banding. (A higher-order-function formulation —
      // transform(sequence(..), i -> array_min(..)) — is interpreted
      // per-element in Spark and benches ~8x slower; HOFs stay out of
      // this hot path deliberately.)
      def build = signaturesOf(Tables.documents(spark, sfDir))
      graft.IndexStore.resolve(spark, sfDir, "minhash_sig", Some("doc_id"))(build)
        .getOrElse(build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    }

  /** Band-signature expansion of a signature frame — ONE definition
    * shared by the full self-join pass and the incremental
    * tranche-vs-landed pass, so a banding change (band count, rows per
    * band, band hash) can never desynchronize the two.
    */
  private def bandsOf(sig: DataFrame): DataFrame =
    sig
      .withColumn("b", explode(sequence(lit(0), lit(NumBands - 1))))
      .select(col("doc_id"), col("b"),
        md5(array_join(slice(col("mhs"), col("b") * 4 + 1, lit(4)), "|")).as("bsig"))

  /** Estimated Jaccard from two minhash-signature columns — the shared
    * agreement fold ([[bandsOf]]'s rationale applies).
    */
  private def estJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (p, q) => p === q), x => x))
      .cast("double") / NumHashes

  private val lshPairsCache = new graft.SessionCache[DataFrame]

  /** Memoized per (session, dir) and persisted DISK_ONLY (pair grain —
    * banding keeps it linear in corpus size, but it is still
    * sub-corpus-SIZED, not bounded ⇒ the storage-level rule): TEN
    * consumers reference this frame (the confirm census, components at
    * both thresholds, soft-dedup weights, the lexsem agreement +
    * calibration pair, recall eval, cluster stats, the release
    * pipeline's loser set, split leakage), and Spark plans common
    * subexpressions independently — without memoization each one
    * re-pays the band self-join + estimate fold per query
    * (the [[graft.functions.Retrieval.bm25Scores]] rationale).
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    lshPairsCache.getOrElseUpdate(spark, sfDir) {
      minhashLshBuild(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }

  private def minhashLshBuild(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = minhashSignatures(spark, sfDir)
    val bands = bandsOf(sig)
    val cand = bands.toDF("doc_a", "b", "bsig")
      .join(bands.toDF("doc_b", "b_r", "bsig_r"),
        col("b") === col("b_r") && col("bsig") === col("bsig_r") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sig.toDF("doc_a", "mhs_a"), "doc_a")
      .join(sig.toDF("doc_b", "mhs_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        estJaccard(col("mhs_a"), col("mhs_b")).as("est_jaccard"))
  }

  /** Incremental near-dup — the ARRIVING-BATCH form of [[minhashLsh]]
    * and the reason the signature index is maintained at all (batch
    * build + [[graft.streaming.CorpusPrep.startIndexRefresh]] appends):
    * when a new tranche lands, production never re-pairs the whole
    * corpus — it band-joins the NEW signatures against the landed ones
    * only. Here "new" is the corpus's last tenth by doc_id (cutoff
    * derived from the corpus itself — one scalar aggregate riding a
    * 1-row broadcast, active at every scale factor); production passes
    * the tranche id the same way.
    *
    * Scale shape: candidate work is |new|·band-occupancy instead of
    * the full self-join's |corpus|·occupancy — the asymmetric join is
    * what makes continuous dedup affordable at 100 TB (the old×old
    * pairs were already resolved in earlier tranches). Signature and
    * estimate machinery are the memoized [[minhashSignatures]] and the
    * same zip_with agreement fold as [[minhashLsh]], so the grade is
    * bit-identical to the full pass on the shared pairs.
    */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = minhashSignatures(spark, sfDir)
    val cut = Tables.documents(spark, sfDir)
      .agg((max(col("doc_id")) + 1 - expr("count(1) div 10")).as("cutoff"))
    val bands = bandsOf(sig).crossJoin(broadcast(cut))
    val newB = bands.filter(col("doc_id") >= col("cutoff"))
      .select(col("doc_id").as("doc_new"), col("b"), col("bsig"))
    val oldB = bands.filter(col("doc_id") < col("cutoff"))
      .select(col("doc_id").as("doc_old"), col("b").as("b_r"), col("bsig").as("bsig_r"))
    newB.join(oldB, col("b") === col("b_r") && col("bsig") === col("bsig_r"))
      .select("doc_new", "doc_old").distinct()
      .join(sig.toDF("doc_new", "mhs_n"), "doc_new")
      .join(sig.toDF("doc_old", "mhs_o"), "doc_old")
      .select(col("doc_new"), col("doc_old"),
        estJaccard(col("mhs_n"), col("mhs_o")).as("est_jaccard"))
      .withColumn("is_dup", col("est_jaccard") >= 0.8)
  }

  /** Train/test split-leakage audit — near-duplicate pairs (est-0.8
    * MinHash grade, the [[components]] edge set) whose endpoints land
    * in DIFFERENT splits of [[graft.functions.TextAnalysis.trainTestSplit]]:
    * each such pair is an eval-set answer the model saw in training.
    * [[decontaminate]] audits the corpus against an EXTERNAL
    * benchmark; this audits the corpus against its own held-out
    * splits — the two leak surfaces a release checklist needs.
    * Reusing the split function (not a re-derived hash) keeps the
    * audited assignment bit-identical to the shipped one.
    *
    * Scale shape: the pair set is the already-linear LSH candidate
    * output; the two split joins attach a 2-column doc-grain relation
    * (bucketing `documents` on doc_id co-locates them for free, the
    * [[editDistConfirm]] note).
    */
  /** Cross-split near-dup pairs for ANY (doc_id, split) assignment —
    * factored so the doc-hash split's audit ([[splitLeakage]]) and the
    * component-aware split's ZERO-leak law (DedupGraphSpec) run the
    * identical census.
    */
  private[graft] def leakagePairsOn(
      spark: SparkSession, sfDir: String, splits: DataFrame): DataFrame = {
    val s = splits.select(col("doc_id"), col("split"))
    minhashLsh(spark, sfDir)
      .filter(col("est_jaccard") >= 0.8)
      .join(s.toDF("doc_a", "split_a"), "doc_a")
      .join(s.toDF("doc_b", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("est_jaccard"))
  }

  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame =
    leakagePairsOn(spark, sfDir,
      graft.functions.TextAnalysis.trainTestSplit(spark, sfDir))

  /** Cluster-aware train/valid/test split — the LEAK-FREE counterpart
    * of the doc-hash split that [[splitLeakage]] audits: every
    * near-dup component (confirmed est ≥ 0.8, [[dupComponents]]'s
    * min-id labels) is assigned ATOMICALLY by hashing its canonical
    * root id, so two near-duplicate documents can never straddle a
    * split boundary — by construction, not by audit (the zero-leak
    * law is still pinned through the [[leakagePairsOn]] census in
    * DedupGraphSpec). Singletons are their own component (label
    * coalesces to doc_id), so their assignment matches the doc-hash
    * recipe's marginal shape; cluster-size skew shifts the 80/10/10
    * proportions only by the duplicated mass — the price every
    * leakage-safe split pays.
    *
    * Scale shape: the labels are the memoized/persisted train-once
    * component index (bucketed on v), so the split is one
    * broadcast-or-bucketed left join + a per-row hash projection —
    * no pair-grain work at assignment time.
    */
  /** The split-hash recipe shared by [[splitByComponent]] and the
    * tranche-churn audit: md5 of the key's decimal string, first 60
    * bits, mod 100 — the same per-key band arithmetic as the doc-hash
    * split, applied at whatever grain the key column carries.
    */
  private[graft] def splitHashMod(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % 100

  /** hash_mod → split band, the 80/10/10 recipe. */
  private[graft] def splitBand(hashMod: Column): Column =
    when(hashMod < 80, "train")
      .when(hashMod < 90, "valid")
      .otherwise("test")

  def splitByComponent(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = dupComponents(spark, sfDir, 0.8)
      .select(col("v").as("doc_id"), col("comp"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("hash_mod", splitHashMod(col("comp")))
      .select(col("doc_id"), col("comp"), col("hash_mod"),
        splitBand(col("hash_mod")).as("split"))
  }

  /** Tranche count for [[splitAssignmentChurn]] — prefixes at
    * quartile doc_id cutoffs, the smallest ladder that exercises a
    * cold start plus three warm-start merges.
    */
  private[graft] val SplitChurnTranches = 4

  private val churnForestCache = new graft.SessionCache[Seq[DataFrame]]

  /** The per-tranche component label forests behind
    * [[splitAssignmentChurn]] — tranche t's labels contract (tranche
    * t−1's forest ∪ the pairs whose id-larger endpoint landed in
    * tranche t), the [[componentsWarmStart]] /
    * [[graft.streaming.TrancheLifecycle]] lifecycle replayed across
    * the whole ladder. Persisted train-once per tranche
    * ([[graft.IndexStore]], bucketed on v) exactly like
    * [[priorComponents]]: in production each forest IS release-t's
    * persisted label index, and the churn audit is a read-side join
    * over artifacts that already exist — never a fixpoint at query
    * time.
    */
  private[graft] def splitChurnForests(
      spark: SparkSession, sfDir: String): Seq[DataFrame] =
    churnForestCache.getOrElseUpdate(spark, sfDir) {
      val pairs = minhashLsh(spark, sfDir)
        .filter(col("est_jaccard") >= 0.8).select("doc_a", "doc_b")
      val nDf = broadcast(Tables.documents(spark, sfDir)
        .agg((max(col("doc_id")) + lit(1L)).as("n_docs")))
      var prior: Option[DataFrame] = None
      (1 to SplitChurnTranches).map { t =>
        // the FINAL tranche's prefix is the whole corpus, so its
        // forest IS the already-persisted full-corpus label index
        // (warm chain ≡ cold full fixpoint, the componentsWarmStart
        // law) — reuse it instead of contracting a fourth time
        val forest =
          if (t == SplitChurnTranches) dupComponents(spark, sfDir, 0.8)
          else {
            def build = {
              val newPairs = pairs.crossJoin(nDf)
                .filter(col("doc_b") >= expr(
                    s"n_docs * ${t - 1} div $SplitChurnTranches")
                  && col("doc_b") < expr(s"n_docs * $t div $SplitChurnTranches"))
                .select("doc_a", "doc_b")
              prior match {
                // warm tranches ride the same quotient composition as
                // [[componentsWarmStart]] (r18): the fixpoint contracts
                // delta-grain quotient edges, never the whole prior
                // forest per round (labels identical by the
                // warmQuotient law; the churn oracle recomputes every
                // prefix fixpoint cold)
                case Some(f) => warmQuotient(f, newPairs)
                case None => starComponents(newPairs)._1
              }
            }
            graft.IndexStore
              .resolve(spark, sfDir, s"split_churn_forest_$t", Some("v"))(build)
              .getOrElse(
                build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
          }
        prior = Some(forest)
        forest
      }
    }

  /** Split-assignment churn across tranches — the stability audit on
    * top of [[splitByComponent]]: cluster-atomic assignment is
    * leak-free at every point in time, but when a tranche's edges
    * MERGE two prior components the canonical min-id root (and with it
    * the whole absorbed component's train/valid/test band) can flip.
    * For each tranche t ≥ 2 this censuses the docs already present at
    * t−1 whose component root changed and whose split band actually
    * flipped — the re-shuffle cost a pretraining data platform must
    * budget when it re-releases splits per tranche (flipped docs
    * invalidate any loss/eval attribution pinned to the old split).
    *
    * Tranches are doc_id quartile prefixes (ingest order — the
    * [[graft.streaming.TrancheLifecycle]] monotone-id contract), and
    * the labels are the persisted per-tranche forests
    * ([[splitChurnForests]]), so the steady-state query is three
    * key-grain joins over train-once artifacts. The leak-free-at-
    * every-tranche invariant is pinned in TrancheLifecycleSpec (both
    * endpoints of a confirmed pair share a component, hence a band,
    * at every t); the ORACLE recomputes every prefix fixpoint cold.
    */
  def splitAssignmentChurn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = splitChurnForests(spark, sfDir).zipWithIndex.map {
      case (f, i) =>
        f.select(lit(i + 1).as("t"), col("v").as("doc_id"), col("comp"))
    }.reduce(_.unionByName(_))
    val nDf = broadcast(Tables.documents(spark, sfDir)
      .agg((max(col("doc_id")) + lit(1L)).as("n_docs")))
    // ONE doc-grain pass: each doc carries a row per tranche from its
    // landing tranche onward, the tagged forests attach by a single
    // (t, doc_id) join, and the t−1 comparison is a lag window on the
    // SAME doc_id key — one exchange serves join, window, and nothing
    // else, where the naive per-tranche form pays 2(T−1) joins and
    // T−1 aggregates. The landing tranche is the smallest t with
    // doc_id < n·t div T — the SAME floored cutoff the forest ladder
    // and the oracle use (d.doc_id < n*t // T); solved for t that is
    // ceil(T·(doc_id+1)/n), NOT floor(doc_id·T/n)+1, which differs
    // exactly when n·t is not divisible by T (the boundary doc would
    // land one tranche early engine-side only)
    val assign = Tables.documents(spark, sfDir).select(col("doc_id"))
      .crossJoin(nDf)
      .select(col("doc_id"), explode(sequence(
        expr(s"CAST(($SplitChurnTranches * (doc_id + 1) + n_docs - 1)" +
          " div n_docs AS INT)"),
        lit(SplitChurnTranches))).as("t"))
      .join(labels, Seq("t", "doc_id"), "left")
      .select(col("t"), col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("hash_mod", splitHashMod(col("comp")))
    val w = Window.partitionBy("doc_id").orderBy("t")
    assign
      .withColumn("comp_prev", lag(col("comp"), 1).over(w))
      .withColumn("hm_prev", lag(col("hash_mod"), 1).over(w))
      .filter(col("comp_prev").isNotNull) // the doc's landing tranche
      .groupBy(col("t").cast("long").as("tranche"))
      .agg(count(lit(1)).as("docs_prev"),
        count_if(col("comp") =!= col("comp_prev")).as("comp_changed"),
        count_if(splitBand(col("hash_mod")) =!= splitBand(col("hm_prev")))
          .as("split_changed"))
  }

  /** Swept est-Jaccard thresholds for [[recallEval]], in permille.
    * The 16-hash estimate moves in 1/16 steps, so the sweep sits on
    * representable grades (8/16, 12/16, 14/16, 16/16) and every
    * `est ≥ thr/1000` compare is exact in both engines.
    */
  private val RecallThresholdsPermille = Seq(500L, 750L, 875L, 1000L)

  /** Precision/recall evaluation of the MinHash-LSH near-dup path
    * against exact n-gram Jaccard ground truth — the dedup-side twin of
    * the ANN `sim_recall_eval`: band count and confirm threshold are
    * tuned FROM this table (a sweep of the estimate threshold against
    * the exact grade), not from folklore. Ground truth is
    * [[ngramJaccard]]'s df-capped exact pairs at jaccard ≥ 0.5;
    * prediction is [[minhashLsh]] confirmed at each swept threshold.
    * Counts are integer-exact; precision/recall ship as ppm integers
    * (`hits·10⁶ div preds`), zero-guarded.
    *
    * Scale shape: both inputs are the memoized candidate-bounded pair
    * frames (banded blocking + df caps keep them linear in corpus
    * size, never all-pairs); the eval adds one full-outer join on the
    * pair key and one threshold-conditional aggregate whose output is
    * threshold-cardinality. At 100 TB production runs the same eval on
    * a hash-sampled doc subset — the pair frames' generators already
    * take the corpus frame as input, so sampling composes upstream.
    */
  def recallEval(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = ngramJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), lit(true).as("is_true"))
    val pred = minhashLsh(spark, sfDir)
    val pairs = pred.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("est_jaccard"), lit(-1.0)).as("est"),
        coalesce(col("is_true"), lit(false)).as("is_true"))
    pairs
      .select(explode(typedLit(RecallThresholdsPermille)).as("threshold_permille"),
        col("est"), col("is_true"))
      .withColumn("hit", col("est") >= col("threshold_permille").cast("double") / 1000.0)
      .groupBy("threshold_permille")
      .agg(count_if(col("is_true")).as("n_truth"),
        count_if(col("hit")).as("n_pred"),
        count_if(col("hit") && col("is_true")).as("n_hit"))
      .withColumn("precision_e6",
        when(col("n_pred") > 0, expr("n_hit * 1000000 div n_pred")).otherwise(0L))
      .withColumn("recall_e6",
        when(col("n_truth") > 0, expr("n_hit * 1000000 div n_truth")).otherwise(0L))
  }

  /** Edit-distance confirmation of MinHash-LSH candidates — the
    * expensive exact check in its only scale-sane position: AFTER
    * blocking. Levenshtein is O(|a|·|b|) per pair, so it can never run
    * on all pairs; on the LSH candidate set (linear in corpus size by
    * banding) it is a bounded per-pair cost. Output keeps the raw
    * integer distance plus a normalized similarity so the dedup
    * threshold stays a downstream policy.
    *
    * The two doc_id joins fetch candidate texts — at 100 TB they are
    * dominated by the corpus scan itself (candidates ≪ corpus); a
    * production warehouse co-locates them for free by bucketing
    * `documents` on doc_id, exactly as Bench buckets the fact tables.
    */
  def editDistConfirm(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b")
      .join(docs.toDF("doc_a", "text_a"), "doc_a")
      .join(docs.toDF("doc_b", "text_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        greatest(length(col("text_a")), length(col("text_b"))).as("max_len"))
      // total even for two empty texts (similarity := 1): today such
      // docs can't reach LSH (sub-5-word docs shingle to null), but
      // Spark's null-yielding division vs DuckDB's would silently
      // break parity if the blocking path ever changed
      .withColumn("similarity",
        when(col("max_len") > 0,
          round(lit(1.0) - col("edit_dist").cast("double") / col("max_len"), 6))
          .otherwise(lit(1.0)))
  }

  /** Min-label propagation over an undirected edge list `(src, dst)`:
    * every vertex converges to the smallest doc_id reachable from it —
    * its connected component. Iterations run as distributed
    * join+groupBy rounds with a driver-side SCALAR convergence check
    * (a count, never a data collect — the standard shape of every
    * iterative algorithm on Spark); per-round state is the
    * (vertex, label) table, bounded narrow (16 B/vertex, the shape the
    * storage-level rule allows in memory), persisted per round and the
    * previous round unpersisted, so lineage never grows unboundedly.
    * Rounds needed = graph diameter — fine for shallow near-dup
    * clusters, but the production path is [[starComponents]]
    * (O(log n) rounds); this form is kept as the simpler
    * diameter-bounded alternative and cross-checked against it in
    * DedupGraphSpec. Hitting the round cap RAISES (a silently
    * non-converged fixpoint would return wrong components).
    *
    * Returns the labels frame UNPERSISTED (lineage locally
    * checkpointed, iteration state cleaned up internally), so callers
    * leak nothing per invocation.
    */
  /** Materialize `df` into the cache and return BOTH the persisted
    * handle (for later unpersist) and a lineage-truncated view of it.
    * Iterative algorithms MUST cut lineage every round: each round's
    * logical plan otherwise embeds the previous round's several times
    * over, and Catalyst re-analyzes an exponentially growing tree —
    * the caching layer makes execution cheap but planning alone hangs
    * after ~10 rounds. The flat view reads the cached blocks through a
    * LogicalRDD, so downstream plans start from a leaf.
    */
  private def materializeFlat(df: DataFrame): (DataFrame, DataFrame) =
    materializeFlat(df, df.sparkSession)

  private def materializeFlat(
      df: DataFrame, session: SparkSession): (DataFrame, DataFrame) = {
    val mat = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flat = session.createDataFrame(mat.rdd, mat.schema)
    (mat, flat)
  }

  private[graft] def minLabelPropagate(edgesIn: DataFrame, maxRounds: Int = 50): DataFrame = {
    val (edgesMat, edges) = materializeFlat(edgesIn.toDF("src", "dst"))
    var labelsMat = edgesMat
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("comp"))
    var first = true
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val prevMat = labelsMat
      val prev = labels
      val viaNeighbor = edges.join(labels, edges("dst") === labels("v"))
        .select(edges("src").as("v"), col("comp"))
      val (nextMat, next) = materializeFlat(
        labels.unionByName(viaNeighbor)
          .groupBy("v").agg(min(col("comp")).as("comp")))
      changed = next.join(prev.toDF("v", "prev_comp"), "v")
        .filter(col("comp") =!= col("prev_comp")).count()
      if (!first) prevMat.unpersist()
      first = false
      labelsMat = nextMat
      labels = next
      rounds += 1
    }
    if (changed > 0) {
      if (!first) labelsMat.unpersist()
      edgesMat.unpersist()
      throw new IllegalStateException(
        s"minLabelPropagate did not converge in $maxRounds rounds " +
          s"(graph diameter exceeds the cap; use starComponents)")
    }
    // hand back a self-contained, unpersisted frame; iteration state is
    // released here, not leaked into the caller's session
    val out = labels.localCheckpoint(true)
    if (!first) labelsMat.unpersist()
    edgesMat.unpersist()
    out
  }

  /** Large-star / small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round contraction that replaces diameter-bounded label
    * propagation for adversarial shapes: templated/spam near-dup
    * CHAINS are exactly what LSH produces at corpus scale, and a
    * 10⁶-doc chain needs 10⁶ propagation rounds but ~2·log₂ n star
    * rounds.
    *
    * Each round is two join+groupBy contractions over the canonical
    * (big, small) edge list:
    *  - large-star: every vertex's larger neighbors re-attach to its
    *    smallest neighbor-or-self `m` — emit (v, m) for v ∈ Γ(u), v>u;
    *  - small-star: every vertex and its smaller neighbors attach to
    *    the minimum — emit (u, m) and (v, m) for v ∈ Γ₋(u).
    * The fixpoint is a star forest: every vertex points at its
    * component's minimum doc_id. Convergence is ONE scalar action per
    * round — (count, commutative XOR of xxhash64(u,v)) over the
    * distinct edge set — equal pairs across rounds mean an unchanged
    * set up to a ~2⁻⁶⁴ hash-collision bound per round, the same trade
    * [[ngramJaccard]] makes for hash-for-string equality (an exact
    * anti-join check would cost a second join job per round for a
    * failure mode rarer than hardware corruption). Per-round state is
    * the bounded-narrow edge list, previous round unpersisted. Hitting
    * the cap RAISES rather than returning a partial fixpoint.
    *
    * Returns ((v, comp) labels for every vertex, rounds used); the
    * labels frame is handed back unpersisted with checkpointed
    * lineage, iteration state cleaned up internally.
    */
  /** Target edge rows per shuffle partition inside a
    * [[starComponents]] round (~16-24 B/row ⇒ a few tens of MB).
    */
  private val EdgeRowsPerPartition = 1L << 21

  private[graft] def starComponents(
      edgesIn: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    // (count, xor-of-hashes) fingerprint of the distinct edge set in a
    // single action; materializes the persisted frame as a side effect
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // Round shuffles are sized from the EXACTLY-known edge count of
    // the previous round (the fingerprint action already paid for it):
    // star contraction shrinks the frame geometrically, and re-running
    // a 25-row round at the session's full shuffle width is pure stage
    // overhead locally and wasted empty tasks on a cluster — the same
    // re-sizing AQE performs from runtime stats, here from an exact
    // count. The iteration runs on a CLONED session so the sizing
    // never touches the caller's spark.sql.shuffle.partitions; cache
    // blocks are SparkContext-level, so persisted rounds are shared.
    val owner = edgesIn.sparkSession
    val iter = owner.newSession()
    // AQE OFF for the iteration (clone-scoped — the caller's session
    // keeps its default): every contraction round already gets its
    // shuffle width from the EXACT edge count below, which is the
    // decision AQE would re-derive from runtime stats at ~40-80 ms of
    // per-exchange driver latency — paid on every exchange of every
    // round of an iterative fixpoint. The round-12 AQE A/B measured
    // the star-CC queries as the only per-query regressions under the
    // AQE-on default (dedup_components_warm +0.92 s) for exactly this
    // reason; nothing else AQE offers (skew split, BHJ conversion)
    // applies to the tiny canonical-edge frames inside the loop.
    iter.conf.set("spark.sql.adaptive.enabled", "false")
    val maxParts = owner.sessionState.conf.numShufflePartitions.toLong
    def roundParts(edgeCount: Long): Int =
      math.max(1L, math.min(maxParts,
        edgeCount / EdgeRowsPerPartition + 1)).toInt
    val (edgesMat0, _) = materializeFlat(
      edgesIn.toDF("src", "dst")
        .select(greatest(col("src"), col("dst")).as("u"),
          least(col("src"), col("dst")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    var edgesMat = edgesMat0
    var edges = iter.createDataFrame(edgesMat.rdd, edgesMat.schema)
    var (n, chk) = fingerprint(edgesMat)
    var rounds = 0
    var converged = n == 0
    while (!converged && rounds < maxRounds) {
      val parts = roundParts(n)
      iter.conf.set("spark.sql.shuffle.partitions", parts)
      // large-star over the symmetric adjacency; ONE explicit exchange
      // on u serves both the neighbor-min aggregate and the join probe
      // (identical exchange subtrees → ReusedExchange), where separate
      // groupBy/join planning would shuffle the adjacency twice
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(parts, col("u"))
      val lsMin = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val ls = sym.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m ⇒ canonical
        .repartition(parts, col("u"))
      // small-star over the (big, small)-oriented result — same
      // one-exchange-for-both shape
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val (nextMat, next) = materializeFlat(
        ls.join(ssMin, "u")
          .select(col("v").as("u"), col("m").as("v")) // smaller neighbor → m
          .filter(col("u") =!= col("v"))
          .unionByName(ssMin.select(col("u"), col("m").as("v"))) // u → m
          .repartition(parts, col("u"), col("v"))
          .distinct(), iter)
      val (cnt, nextChk) = fingerprint(nextMat)
      converged = cnt == n && nextChk == chk
      edgesMat.unpersist()
      edgesMat = nextMat
      edges = next
      n = cnt
      chk = nextChk
      rounds += 1
    }
    if (!converged && n > 0) {
      edgesMat.unpersist()
      throw new IllegalStateException(
        s"starComponents did not converge in $maxRounds rounds")
    }
    val labels = edges.select(col("u").as("v"), col("v").as("comp"))
      .unionByName(
        edges.select(col("v")).distinct().select(col("v"), col("v").as("comp")))
    // hand the result back ON THE CALLER'S session (downstream plans
    // must use its conf, not the iteration clone's narrowed shuffles)
    val labelsChk = labels.localCheckpoint(true)
    val out = owner.createDataFrame(labelsChk.rdd, labelsChk.schema)
    edgesMat.unpersist()
    (out, rounds)
  }

  /** Near-dup cluster RESOLUTION — the step after candidate
    * generation that every dedup pipeline needs: candidate pairs are a
    * graph, and "keep one copy per duplicate cluster" means one keeper
    * per CONNECTED COMPONENT (pairwise keep-the-lower-id would drop
    * both b and c of a chain a–b, b–c even though a,c never matched).
    * Components come from [[minLabelPropagate]] over the MinHash-LSH
    * candidate pairs; the keeper is the smallest doc_id in its
    * component, consistent with [[exact]]'s keeper rule. The oracle
    * reproduces the fixpoint with a recursive CTE.
    */
  /** Duplicate-cluster labels `(v, comp)` over the MinHash-LSH
    * candidate graph at similarity threshold `minEst` — the
    * train-once artifact of the whole dedup family: the star-
    * contraction fixpoint runs ONCE per (corpus, threshold), memoized
    * in-session (DISK_ONLY — label rows grow with the dup-graph
    * vertex count, the storage-level rule) and warehouse-persisted
    * bucketed on `v` under [[graft.IndexStore.IndexDirKey]], so every
    * consumer ([[components]], the corpus-prep keeper policies)
    * resolves cluster membership scan-only instead of re-iterating
    * the fixpoint per query — exactly how a production pipeline
    * materializes its dedup verdicts once per corpus release.
    */
  private val componentCache = new graft.SessionCache[DataFrame]

  private[graft] def dupComponents(
      spark: SparkSession, sfDir: String, minEst: Double): DataFrame =
    componentCache.getOrElseUpdate(spark, s"$sfDir#est$minEst") {
      def build = starComponents(
        minhashLsh(spark, sfDir)
          .filter(col("est_jaccard") >= minEst)
          .select(col("doc_a"), col("doc_b")))._1
      graft.IndexStore.resolve(spark, sfDir,
          s"dup_components_${math.round(minEst * 100)}", Some("v"))(build)
        .getOrElse(build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    }

  def components(spark: SparkSession, sfDir: String): DataFrame =
    dupComponents(spark, sfDir, 0.0)
      .select(col("v").as("doc_id"), col("comp").as("component"),
        (col("v") === col("comp")).as("is_keeper"))

  /** Warm-start component resolution — the tranche-lifecycle form of
    * [[dupComponents]]: when a new tranche lands, production does NOT
    * re-iterate the contraction fixpoint over the whole candidate
    * graph; it contracts (prior label FOREST ∪ tranche edges). The
    * prior labels encode all old×old connectivity as depth-1 stars
    * (v → comp), so the warm graph has the same components and the
    * same min-id canonical labels as a full recompute — which is why
    * the ORACLE is the full recursive fixpoint — while the contraction
    * restarts from already-flattened state and converges in no more
    * rounds than the cold run (pinned), typically O(1) of them.
    *
    * Here the prior state derives inline from the old×old pairs (the
    * benchmark corpus is static; production reads the persisted
    * release-(n−1) label index), and tranche edges are the pairs whose
    * id-larger endpoint is new — the [[allPairsIncremental]] /
    * [[incrementalDedup]] cut, so every pair involving a new doc
    * arrives through them.
    */
  def componentsWarmStart(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = minhashLsh(spark, sfDir)
      .filter(col("est_jaccard") >= 0.8).select("doc_a", "doc_b")
    val cut = Tables.documents(spark, sfDir)
      .agg((max(col("doc_id")) + 1 - expr("count(1) div 10")).as("cutoff"))
    val newPairs = pairs.crossJoin(broadcast(cut))
      .filter(col("doc_b") >= col("cutoff"))
      .select("doc_a", "doc_b")
    // QUOTIENT-GRAPH warm start (r18): the previous shape fed the
    // whole prior label FOREST back into the contraction, so every
    // round re-shuffled corpus-grain state to merge a delta-grain
    // tranche. The prior labels already encode all old×old
    // connectivity; only the delta can change anything — so contract
    // the DELTA AT COMPONENT GRAIN: map each new pair's endpoints
    // through the prior labels (new vertices map to themselves),
    // run the star fixpoint on those quotient edges alone, and fold
    // the result back over the prior labels with one join. Labels are
    // unchanged by construction: a quotient node is a prior root
    // (= its part's min doc_id) or a new doc_id, so the contracted
    // min over quotient nodes IS the merged component's global min —
    // and the oracle (full recursive fixpoint) re-proves it. The
    // fixpoint now touches O(|delta|) rows per round instead of
    // O(|corpus|) — the per-round shuffle no longer scales with the
    // landed corpus (guide §2.3: decide on lightweight proxies).
    warmQuotient(priorComponents(spark, sfDir), newPairs)
  }

  /** The quotient composition of [[componentsWarmStart]], factored for
    * fixture testing: given prior labels `(v, comp)` and delta pairs
    * `(doc_a, doc_b)`, returns the labels of (prior forest ∪ delta) —
    * pinned row-for-row equal to contracting that union directly
    * (OperatorSpec), with the fixpoint running on component-grain
    * quotient edges only.
    */
  private[graft] def warmQuotient(
      prior: DataFrame, newPairs: DataFrame): DataFrame = {
    val m = prior.select(col("v"), col("comp").as("m"))
    val qe = newPairs
      .join(m.toDF("doc_a", "ma"), Seq("doc_a"), "left")
      .join(m.toDF("doc_b", "mb"), Seq("doc_b"), "left")
      .select(coalesce(col("ma"), col("doc_a")).as("src"),
        coalesce(col("mb"), col("doc_b")).as("dst"))
    val qlab = starComponents(qe)._1.toDF("m", "qcomp")
    // the warm graph's vertex set: forest edge endpoints (non-root
    // vertices + roots of multi-vertex components — prior singletons
    // enter only via the delta) plus every delta endpoint
    val nonSelf = prior.filter(col("v") =!= col("comp"))
    val verts = nonSelf.select(col("v"), col("comp").as("m"))
      .unionByName(nonSelf.select(col("comp").as("v"), col("comp").as("m"))
        .distinct())
      .unionByName(newPairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
        .join(m, Seq("v"), "left")
        .select(col("v"), coalesce(col("m"), col("v")).as("m")))
      .distinct()
    // the warm forest ends in an eagerly materialized LEAF — the same
    // contract [[starComponents]] keeps (labels.localCheckpoint(true)):
    // consumers (the churn census unions four forests and joins them;
    // the bench noop-saves the warm labels) must see `Scan
    // ExistingRDD`, never a live fold-back plan that re-executes the
    // corpus-grain joins on every downstream action (r18 shipped the
    // live plan and regressed dedup_components_warm 1.84→2.55 s while
    // breaking the split_assignment_churn ≤1-shuffle-join pin)
    verts.join(qlab, Seq("m"), "left")
      .select(col("v"), coalesce(col("qcomp"), col("m")).as("comp"))
      .localCheckpoint(true)
  }

  private val priorComponentCache = new graft.SessionCache[DataFrame]

  /** The release-(n−1) label state [[componentsWarmStart]] resumes
    * from — labels over the OLD×OLD candidate pairs only. In
    * production this IS the previous release's persisted label index;
    * here it derives from the same corpus (the benchmark data is
    * static) and persists train-once exactly like [[dupComponents]],
    * so the steady-state warm query pays ONE contraction, not two.
    */
  private[graft] def priorComponents(spark: SparkSession, sfDir: String): DataFrame =
    priorComponentCache.getOrElseUpdate(spark, sfDir) {
      def build = {
        val pairs = minhashLsh(spark, sfDir)
          .filter(col("est_jaccard") >= 0.8).select("doc_a", "doc_b")
        val cut = Tables.documents(spark, sfDir)
          .agg((max(col("doc_id")) + 1 - expr("count(1) div 10")).as("cutoff"))
        starComponents(pairs.crossJoin(broadcast(cut))
          .filter(col("doc_b") < col("cutoff"))
          .select("doc_a", "doc_b"))._1
      }
      graft.IndexStore.resolve(spark, sfDir, "dup_components_prior", Some("v"))(build)
        .getOrElse(build.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    }

  /** Near-dup cluster-size histogram — the summary line of every dedup
    * report (how much of the corpus sits in duplicate mass, and in
    * what shape: a few giant boilerplate clusters vs many pairs): for
    * each multi-doc cluster size at est-Jaccard ≥ 0.8, how many
    * clusters and how many documents. Driven off the memoized
    * [[dupComponents]] label index, so the stats re-aggregate a
    * key-grain frame — two tiny exchanges, never the corpus; output is
    * bounded by the largest cluster size.
    */
  def clusterStats(spark: SparkSession, sfDir: String): DataFrame =
    dupComponents(spark, sfDir, 0.8)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"))

  /** Soft dedup — per-document TRAINING WEIGHT instead of a hard drop:
    * each near-dup cluster (est-Jaccard ≥ 0.8 components, the
    * [[clusterStats]] index) shares one document's worth of weight
    * (`1000 div size` per-mille, integer-exact), singletons keep 1000.
    * The "count duplicates once" trick for corpora where near-dups
    * carry signal (boilerplate vs canonical pages) — down-weighting
    * preserves coverage where [[components]]-based dropping loses it.
    *
    * Scale shape: rides the memoized component label index; the
    * cluster-size aggregate is label-grain, and the two left joins
    * back to the corpus are equi-joins on doc_id/comp (AQE-broadcast
    * when the dup mass is small — the common case).
    */
  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = dupComponents(spark, sfDir, 0.8)
      .select(col("v").as("doc_id"), col("comp"))
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("sz"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .join(sizes, Seq("comp"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        expr("CAST(1000 div coalesce(sz, 1) AS BIGINT)").as("weight_pm"))
  }

  /** Band configurations swept by [[lshSweep]]: (bands, rows/band)
    * over the 16-hash signature.
    */
  private val SweepConfigs = Seq(2, 4, 8)

  /** Hot-bucket cap for [[lshSweep]]: band buckets holding more docs
    * than this are excluded from pair generation (and counted in the
    * report). The loose 8-band/2-row config would otherwise go
    * quadratic inside boilerplate buckets at corpus scale — the
    * [[DefaultMaxShingleDf]] discipline applied to band signatures.
    */
  private val SweepBucketCap = 64L

  /** LSH band-parameter sweep — the tuning report behind the
    * banding choice ([[minhashLsh]] ships bands=4): for each
    * (bands, rows) split of the same 16-hash signature, the candidate
    * pair count, how many candidates confirm at est-Jaccard ≥ 0.8,
    * and the integer per-mille precision. More bands → higher recall
    * and more (worse-precision) candidates; this query measures that
    * curve ON THE CORPUS instead of trusting the S-curve formula.
    *
    * Scale shape: one banding pass per config over the memoized
    * signature frame (3 self-joins on band signatures — each the
    * [[minhashLsh]] shape), folded to a 3-row report. The confirm
    * test reuses the full signature agreement count; no shingle
    * re-scan.
    */
  def lshSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSignatures(spark, sfDir)
    // ALL configs band in one pass: each signature row fans out to
    // Σnb = 14 (nb, b, bsig) rows, so one occupancy aggregate, one
    // anti join, and one pair join serve the whole sweep (a
    // per-config loop triples every stage; the report is grouped by
    // nb at the end)
    val cfgLit = typedlit(SweepConfigs)
    val bandsAll = sig
      .select(col("doc_id"), col("mhs"), explode(cfgLit).as("nb"))
      .select(col("doc_id"), col("mhs"), col("nb"),
        explode(sequence(lit(0), col("nb") - 1)).as("b"))
      .select(col("doc_id"), col("nb"), col("b"),
        md5(array_join(
          slice(col("mhs"), col("b") * (lit(NumHashes) / col("nb")).cast("int") + 1,
            (lit(NumHashes) / col("nb")).cast("int")), "|")).as("bsig"))
    // hot-bucket cap BEFORE the self-join: bucket occupancy decides
    // pair work (occupancy² per bucket), so oversize band buckets are
    // excluded from pair generation and surfaced as a count
    val occ = bandsAll.groupBy("nb", "b", "bsig").agg(count(lit(1)).as("occ"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = occ.filter(col("occ") > SweepBucketCap)
    val cappedCounts = capped.groupBy(col("nb").as("cc_nb"))
      .agg(count(lit(1)).as("n_capped_buckets"))
    val keptBands = bandsAll.join(
      capped.select(col("nb").as("cn"), col("b").as("cb"), col("bsig").as("cs")),
      col("nb") === col("cn") && col("b") === col("cb") && col("bsig") === col("cs"),
      "left_anti")
    val cand = keptBands.select(col("nb"), col("doc_id").as("doc_a"),
        col("b"), col("bsig"))
      .join(keptBands.select(col("nb").as("nb_r"), col("doc_id").as("doc_b"),
        col("b").as("b_r"), col("bsig").as("bsig_r")),
        col("nb") === col("nb_r") && col("b") === col("b_r") &&
          col("bsig") === col("bsig_r") && col("doc_a") < col("doc_b"))
      .select("nb", "doc_a", "doc_b").distinct()
    val report = cand
      .join(sig.toDF("doc_a", "mhs_a"), "doc_a")
      .join(sig.toDF("doc_b", "mhs_b"), "doc_b")
      .select(col("nb"),
        (size(filter(zip_with(col("mhs_a"), col("mhs_b"), (p, q) => p === q),
          x => x)) * 5 >= NumHashes * 4).as("confirmed"))
      .groupBy("nb")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("confirmed"), 1L).otherwise(0L)).as("n_confirmed"))
    // config spine: a config with zero candidates (or zero capped
    // buckets) still reports a row
    SweepConfigs.map(nb => (nb.toLong, (NumHashes / nb).toLong))
      .toDF("n_bands", "rows_per_band")
      .join(report, col("n_bands") === col("nb"), "left_outer")
      .join(cappedCounts, col("n_bands") === col("cc_nb"), "left_outer")
      .select(col("n_bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_confirmed"), lit(0L)).as("n_confirmed"),
        when(coalesce(col("n_candidates"), lit(0L)) === 0, 0L)
          .otherwise(expr("CAST(n_confirmed * 1000 div n_candidates AS BIGINT)"))
          .as("precision_pm"),
        coalesce(col("n_capped_buckets"), lit(0L)).as("n_capped_buckets"))
  }

  /** Quality-vs-duplication calibration curve — does the quality
    * score actually separate boilerplate? Per quality-score decile,
    * the integer per-mille share of docs sitting in an est-0.8
    * near-dup cluster. If dup share doesn't fall as quality rises,
    * the quality gate and the dedup pass are fighting over the same
    * mass and the release recipe ([[graft.operators.Advanced
    * .corpusPrepFull]]) is mis-ordered — this is the diagnostic that
    * says so. Buckets floor identical cross-engine doubles (the
    * text_quality score is hash-verified), so the binning is exact;
    * shares are `n·1000 div total`.
    *
    * Scale shape: rides the memoized component label index and the
    * scan-side quality projection — one doc-grain left join, a
    * 10-row aggregate.
    */
  def qualityCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val q = graft.functions.TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    val members = dupComponents(spark, sfDir, 0.8)
      .select(col("v").as("doc_id"), lit(1L).as("is_dup"))
    q.join(members, Seq("doc_id"), "left_outer")
      .select(least(lit(9L), floor(col("quality_score") * 10).cast("long"))
        .as("q_bucket"), coalesce(col("is_dup"), lit(0L)).as("d"))
      .groupBy("q_bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("d")).as("n_dup_members"))
      .select(col("q_bucket"), col("n_docs"), col("n_dup_members"),
        expr("CAST(n_dup_members * 1000 div n_docs AS BIGINT)").as("dup_pm"))
  }

  /** Fixed iteration count / rank scale for [[graphRank]]. */
  private val PageRankIters = 3
  private val RankScale = 1000000L

  /** Integer PageRank over the near-dup graph — the centrality read of
    * the duplicate structure ([[components]] says WHICH docs cluster;
    * rank says which doc is the hub of its boilerplate family, the
    * natural canonical-representative signal): 3 damped iterations
    * (d = 0.85) over the symmetric est-0.8 edge set.
    *
    * ALL-INTEGER variant: ranks live in 1e6 fixed-point, each
    * iteration is `150000 + (85·Σ(r div deg)) div 100` — integer
    * division only, so the result is bit-identical across engines and
    * partitionings (float PageRank sums are order-dependent).
    * Deterministic truncation loss is part of the contract.
    *
    * Scale shape: each iteration is one equi-join of the rank frame to
    * the edge list plus one map-side-combined aggregate on `dst` —
    * the [[starComponents]] discipline with a FIXED round count (no
    * convergence detection job); degree and edges build once. At
    * billion-edge scale the joins hash on doc ids exactly like the CC
    * resolution path.
    */
  def graphRank(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = minhashLsh(spark, sfDir)
      .filter(col("est_jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    // the degree-annotated edge frame feeds all three iterations —
    // persist IT (dup-graph-sized, small at est ≥ 0.8), not a
    // throwaway materialization of the result: an eager count-then-
    // unpersist here would leave the returned frame to recompute the
    // whole chain again on the caller's action
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("dg"))
    val withDeg = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.select(col("src").as("v"), lit(RankScale).as("r"))
    for (_ <- 1 to PageRankIters) {
      ranks = withDeg.join(ranks, col("src") === col("v"))
        .select(col("dst"), expr("CAST(r div dg AS BIGINT)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("in_sum"))
        .select(col("dst").as("v"),
          expr("CAST(150000 + (85 * in_sum) div 100 AS BIGINT)").as("r"))
    }
    ranks.select(col("v").as("doc_id"), col("r").as("rank_e6"))
  }

  /** 60-bit SimHash per document: per-word 60-bit hash (first 15 hex
    * chars of md5 — stays in signed-long range), each bit voted +count /
    * −count, sign of the vote becomes the bit. One explode(60) per
    * distinct word — fixed fan-out, single aggregation shuffle.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    // One row per word INSTANCE (±1 vote per instance sums to the same
    // total as count-weighted votes per distinct word), then all 60 bit
    // votes as 60 sum() aggregates in a single codegen'd groupBy — one
    // exchange total, no per-(doc,word) pre-aggregation, no
    // interpreted higher-order functions.
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"),
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long").as("h"))
    words
      .groupBy("doc_id")
      .agg(
        voteBit(0).as("v0"),
        (1 until 60).map(j => voteBit(j).as(s"v$j")): _*)
      .select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** +1/−1 vote for bit `j` of the per-word hash. */
  private def voteBit(j: Int): Column =
    sum(when((shiftright(col("h"), j).bitwiseAND(lit(1L))) === 1, lit(1L))
      .otherwise(lit(-1L)))

  /** SimHash near-dup pairs: block on 15-bit chunks (two docs within
    * Hamming distance 3 of a 60-bit signature must agree on at least
    * one of 4 chunks), verify with bit_count(xor) ≤ 8. The chunk join
    * replaces the O(n²) Hamming scan.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // self-joined below; (doc_id, 64-bit signature) rows are the one
    // shape the storage-level rule (Similarity.bucketedEmb scaladoc)
    // allows in memory: 16 bytes/doc regardless of document size
    val sig = simhash(spark, sfDir).cache()
    val chunks = sig
      .withColumn("c", explode(sequence(lit(0), lit(3))))
      .select(col("doc_id"), col("c"),
        expr("shiftright(simhash, 15 * c) & 32767").as("chunk"), col("simhash"))
    chunks.toDF("doc_a", "c", "chunk", "sim_a")
      .join(chunks.toDF("doc_b", "c_r", "chunk_r", "sim_b"),
        col("c") === col("c_r") && col("chunk") === col("chunk_r") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
  }

  /** Shared oracle fragment: per-doc distinct word-5-gram shingles —
    * hoisted to the dependency-free
    * [[graft.functions.SqlFragments]] (see its scaladoc for the
    * clinit-cycle deadlock this prevents); aliased here so this file's
    * many interpolations stay unchanged.
    */
  private[graft] val ShingleCte = graft.functions.SqlFragments.ShingleCte

  /** MinHash-LSH est>=0.8 confirmed-pair / component oracle fragments —
    * hoisted to the dependency-free [[graft.functions.SqlFragments]]
    * (the ShingleCte clinit-cycle rationale: TextAnalysis's holdout
    * oracle interpolates the component fixpoint too); aliased here so
    * this file's many interpolations stay unchanged.
    */
  private[graft] val Lsh08PairCtes = graft.functions.SqlFragments.Lsh08PairCtes
  private[graft] val Comp08Ctes = graft.functions.SqlFragments.Comp08Ctes

  /** Shared oracle for [[decontaminate]] and [[decontaminateBloom]] —
    * the bloom path must produce the exact path's answer bit-for-bit.
    */
  private lazy val DecontaminateSql: String =
    s"""WITH $ShingleCte,
        bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < $BenchmarkDocs),
        hits AS (SELECT e.doc_id, count(*) AS n_cont
                 FROM ex e JOIN bench USING (shingle) GROUP BY e.doc_id)
        SELECT s.doc_id,
               CAST(len(s.s) AS INTEGER) AS n_shingles,
               CAST(coalesce(h.n_cont, 0) AS INTEGER) AS n_contaminated
        FROM sh s LEFT JOIN hits h USING (doc_id)"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
                count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",
    // brute force IS the contract: prefix filtering is completeness-
    // preserving, so the oracle needs none of the plan's machinery
    "dedup_allpairs_exact" ->
      s"""WITH $ShingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
                 CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
                 CAST(inter * 1000000 // (x.sz + y.sz - inter) AS BIGINT)
                   AS jaccard_ppm
          FROM inter
          JOIN sizes x ON doc_a = x.doc_id
          JOIN sizes y ON doc_b = y.doc_id
          WHERE $AllPairsDen * inter >= $AllPairsNum * (x.sz + y.sz - inter)""",
    "dedup_allpairs_incremental" ->
      s"""WITH $ShingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
          cut AS (SELECT max(doc_id) + 1 - count(*) // 10 AS cutoff FROM documents),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            WHERE b.doc_id >= (SELECT cutoff FROM cut)
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
                 CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
                 CAST(inter * 1000000 // (x.sz + y.sz - inter) AS BIGINT)
                   AS jaccard_ppm
          FROM inter
          JOIN sizes x ON doc_a = x.doc_id
          JOIN sizes y ON doc_b = y.doc_id
          WHERE $AllPairsDen * inter >= $AllPairsNum * (x.sz + y.sz - inter)""",
    "dedup_ngram_jaccard" ->
      s"""WITH $ShingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
          kept AS (SELECT shingle FROM ex GROUP BY shingle
                   HAVING count(*) <= $DefaultMaxShingleDf),
          exc AS (SELECT e.doc_id, e.shingle FROM ex e JOIN kept USING (shingle)),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b,
                 CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) AS jaccard
          FROM inter
          JOIN sizes x ON doc_a = x.doc_id
          JOIN sizes y ON doc_b = y.doc_id
          WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.5""",
    "dedup_spans_clean" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          si AS (SELECT doc_id, ws,
                        unnest([i for i in range((len(ws)-1) // $SpanTokens + 1)]) AS span_idx
                 FROM d),
          sp AS (SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                        array_to_string(
                          ws[(span_idx*$SpanTokens+1):(span_idx*$SpanTokens+$SpanTokens)], ' ')
                          AS span
                 FROM si),
          f AS (SELECT span, min(doc_id * ${SpanIdxCap}::BIGINT + span_idx) AS fk
                FROM sp GROUP BY span),
          kept AS (SELECT s.doc_id, s.span_idx, s.span
                   FROM sp s JOIN f USING (span)
                   WHERE s.doc_id * ${SpanIdxCap}::BIGINT + s.span_idx = f.fk)
          SELECT doc_id, count(*) AS n_kept_spans,
                 string_agg(span, ' ' ORDER BY span_idx) AS clean_text
          FROM kept GROUP BY doc_id""",
    "dedup_containment" ->
      s"""WITH $ShingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
          kept AS (SELECT shingle FROM ex GROUP BY shingle
                   HAVING count(*) <= $DefaultMaxShingleDf),
          exc AS (SELECT e.doc_id, e.shingle FROM ex e JOIN kept USING (shingle)),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b,
                 CAST(inter AS DOUBLE) / least(x.sz, y.sz) AS containment
          FROM inter
          JOIN sizes x ON doc_a = x.doc_id
          JOIN sizes y ON doc_b = y.doc_id
          WHERE CAST(inter AS DOUBLE) / least(x.sz, y.sz) >= $ContainmentFloor""",
    "dedup_winnow_pairs" -> {
      import graft.functions.TextAnalysis.{WinnowK, WinnowW}
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          h AS (
            SELECT doc_id,
                   [('0x' || substr(md5(array_to_string(ws[i:i+${WinnowK - 1}], ' ')), 1, 15))::BIGINT
                    for i in range(1, len(ws) - ${WinnowK - 2})] AS hs
            FROM d WHERE len(ws) >= $WinnowK),
          f AS (
            SELECT doc_id,
                   unnest(list_distinct(
                     [list_min(hs[i:i+${WinnowW - 1}])
                      for i in range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1)]))
                     AS fingerprint
            FROM h),
          cold AS (SELECT fingerprint FROM f GROUP BY fingerprint
                   HAVING count(*) <= $WinnowDfCap),
          k AS (SELECT f.doc_id, f.fingerprint FROM f JOIN cold USING (fingerprint))
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
          FROM k a JOIN k b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING count(*) >= $WinnowMinShared"""
    },
    "dedup_source_overlap" -> {
      import graft.functions.TextAnalysis.{WinnowK, WinnowW}
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          h AS (
            SELECT doc_id,
                   [('0x' || substr(md5(array_to_string(ws[i:i+${WinnowK - 1}], ' ')), 1, 15))::BIGINT
                    for i in range(1, len(ws) - ${WinnowK - 2})] AS hs
            FROM d WHERE len(ws) >= $WinnowK),
          f AS (
            SELECT doc_id,
                   unnest(list_distinct(
                     [list_min(hs[i:i+${WinnowW - 1}])
                      for i in range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1)]))
                     AS fingerprint
            FROM h),
          sf AS (SELECT DISTINCT dd.source, f.fingerprint
                 FROM f JOIN documents dd USING (doc_id))
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_fps
          FROM sf a JOIN sf b
            ON a.fingerprint = b.fingerprint AND a.source < b.source
          GROUP BY 1, 2"""
    },
    "dedup_spans" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          si AS (SELECT doc_id, ws,
                        unnest([i for i in range((len(ws)-1) // $SpanTokens + 1)]) AS span_idx
                 FROM d),
          sp AS (SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                        array_to_string(
                          ws[(span_idx*$SpanTokens+1):(span_idx*$SpanTokens+$SpanTokens)], ' ')
                          AS span
                 FROM si),
          f AS (SELECT span, min(doc_id * ${SpanIdxCap}::BIGINT + span_idx) AS fk
                FROM sp GROUP BY span)
          SELECT s.doc_id, s.span_idx,
                 (s.doc_id * ${SpanIdxCap}::BIGINT + s.span_idx) = f.fk AS kept
          FROM sp s JOIN f USING (span)""",
    "decontaminate" -> DecontaminateSql,
    // the bloom prefilter is exact-by-construction (no false negatives
    // + exact confirm join), so the oracle is the SAME statement
    "decontaminate_bloom" -> DecontaminateSql,
    "dedup_incremental" ->
      s"""WITH $ShingleCte,
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          bands AS (
            SELECT doc_id, b, md5(array_to_string(mhs[4*b+1:4*b+4], '|')) AS bsig
            FROM sig, range(4) t(b)),
          cut AS (SELECT max(doc_id) + 1 - count(*) // 10 AS cutoff FROM documents),
          cand AS (
            SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
            FROM bands n JOIN bands o ON n.b = o.b AND n.bsig = o.bsig, cut
            WHERE n.doc_id >= cutoff AND o.doc_id < cutoff)
          SELECT doc_new, doc_old,
                 CAST(len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) AS DOUBLE) / 16
                   AS est_jaccard,
                 CAST(len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) AS DOUBLE) / 16
                   >= 0.8 AS is_dup
          FROM cand JOIN sig x ON doc_new = x.doc_id JOIN sig y ON doc_old = y.doc_id""",
    "dedup_minhash_lsh" ->
      s"""WITH $ShingleCte,
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          bands AS (
            SELECT doc_id, b, md5(array_to_string(mhs[4*b+1:4*b+4], '|')) AS bsig
            FROM sig, range(4) t(b)),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
                 CAST(len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) AS DOUBLE) / 16
                   AS est_jaccard
          FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id""",
    "dedup_recall_eval" ->
      s"""WITH $ShingleCte,
          sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
          keptsh AS (SELECT shingle FROM ex GROUP BY shingle
                     HAVING count(*) <= $DefaultMaxShingleDf),
          exc AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keptsh USING (shingle)),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          truth AS (
            SELECT doc_a, doc_b, true AS is_true
            FROM inter
            JOIN sizes x ON doc_a = x.doc_id
            JOIN sizes y ON doc_b = y.doc_id
            WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.5),
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          bands AS (
            SELECT doc_id, b, md5(array_to_string(mhs[4*b+1:4*b+4], '|')) AS bsig
            FROM sig, range(4) t(b)),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
          pred AS (
            SELECT doc_a, doc_b,
                   CAST(len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) AS DOUBLE) / 16
                     AS est
            FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id),
          pairs AS (
            SELECT coalesce(p.est, -1.0) AS est, coalesce(t.is_true, false) AS is_true
            FROM pred p FULL OUTER JOIN truth t USING (doc_a, doc_b)),
          thr AS (SELECT CAST(unnest([500, 750, 875, 1000]) AS BIGINT) AS threshold_permille)
          SELECT threshold_permille,
                 CAST(count(*) FILTER (WHERE is_true) AS BIGINT) AS n_truth,
                 CAST(count(*) FILTER (WHERE est >= threshold_permille / 1000.0) AS BIGINT) AS n_pred,
                 CAST(count(*) FILTER (WHERE is_true AND est >= threshold_permille / 1000.0) AS BIGINT) AS n_hit,
                 CAST(CASE WHEN count(*) FILTER (WHERE est >= threshold_permille / 1000.0) > 0
                      THEN count(*) FILTER (WHERE is_true AND est >= threshold_permille / 1000.0) * 1000000
                           // count(*) FILTER (WHERE est >= threshold_permille / 1000.0)
                      ELSE 0 END AS BIGINT) AS precision_e6,
                 CAST(CASE WHEN count(*) FILTER (WHERE is_true) > 0
                      THEN count(*) FILTER (WHERE is_true AND est >= threshold_permille / 1000.0) * 1000000
                           // count(*) FILTER (WHERE is_true)
                      ELSE 0 END AS BIGINT) AS recall_e6
          FROM pairs, thr GROUP BY threshold_permille""",
    "dedup_editdist" ->
      s"""WITH $ShingleCte,
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          bands AS (
            SELECT doc_id, b, md5(array_to_string(mhs[4*b+1:4*b+4], '|')) AS bsig
            FROM sig, range(4) t(b)),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
                 CAST(levenshtein(x.text, y.text) AS INTEGER) AS edit_dist,
                 CAST(greatest(length(x.text), length(y.text)) AS INTEGER) AS max_len,
                 CASE WHEN greatest(length(x.text), length(y.text)) > 0
                      THEN round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
                                  / greatest(length(x.text), length(y.text)), 6)
                      ELSE 1.0 END AS similarity
          FROM cand
          JOIN documents x ON doc_a = x.doc_id
          JOIN documents y ON doc_b = y.doc_id""",
    "split_leakage" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes,
          candj AS (
            SELECT doc_a, doc_b,
                   CAST(len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1]))
                     AS DOUBLE) / 16 AS est_jaccard
            FROM cand JOIN sig x ON doc_a = x.doc_id
                      JOIN sig y ON doc_b = y.doc_id),
          splits AS (
            SELECT doc_id,
                   CASE WHEN hash_mod < 80 THEN 'train'
                        WHEN hash_mod < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hash_mod
                  FROM documents))
          SELECT c.doc_a, c.doc_b, sa.split AS split_a, sb.split AS split_b,
                 c.est_jaccard
          FROM candj c JOIN splits sa ON sa.doc_id = c.doc_a
                       JOIN splits sb ON sb.doc_id = c.doc_b
          WHERE c.est_jaccard >= 0.8 AND sa.split != sb.split""",
    // the leak-free split: comps (min-id labels at est >= 0.8, the
    // recursive fixpoint) hashed at COMPONENT grain, singletons
    // coalescing to their own doc_id — the same md5 recipe as
    // split_train_test, applied to the canonical root
    "split_by_component" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes,
          keyed AS (
            SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
            FROM documents d LEFT JOIN comps c ON c.v = d.doc_id)
          SELECT doc_id, comp, hash_mod,
                 CASE WHEN hash_mod < 80 THEN 'train'
                      WHEN hash_mod < 90 THEN 'valid'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, comp,
                       ('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 15))::BIGINT % 100 AS hash_mod
                FROM keyed)""",
    // every prefix fixpoint recomputed COLD (reach carries the tranche
    // dimension; edges restrict to both-endpoints-below-cutoff), while
    // the engine replays the warm-start forest ladder — same labels,
    // the componentsWarmStart contract per tranche
    "split_assignment_churn" ->
      s"""WITH RECURSIVE $ShingleCte, $Lsh08PairCtes,
          nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
          cut AS (SELECT t, (SELECT n FROM nn) * t // $SplitChurnTranches AS cutoff
                  FROM range(1, ${SplitChurnTranches + 1}) r(t)),
          tedges AS (
            SELECT c.t, e.src, e.dst
            FROM cut c, (SELECT doc_a AS src, doc_b AS dst FROM candf
                         UNION ALL
                         SELECT doc_b AS src, doc_a AS dst FROM candf) e
            WHERE greatest(e.src, e.dst) < c.cutoff),
          tverts AS (SELECT DISTINCT t, src AS v FROM tedges),
          reach(t, v, r) AS (
            SELECT t, v, v FROM tverts
            UNION
            SELECT reach.t, reach.v, e.dst FROM reach
            JOIN tedges e ON e.t = reach.t AND e.src = reach.r),
          tcomps AS (SELECT t, v, min(r) AS comp FROM reach GROUP BY t, v),
          assign AS (
            SELECT c.t, d.doc_id, coalesce(tc.comp, d.doc_id) AS comp
            FROM documents d JOIN cut c ON d.doc_id < c.cutoff
            LEFT JOIN tcomps tc ON tc.t = c.t AND tc.v = d.doc_id),
          sbands AS (
            SELECT t, doc_id, comp,
                   CASE WHEN hm < 80 THEN 'train'
                        WHEN hm < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (SELECT t, doc_id, comp,
                         ('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 15))::BIGINT
                           % 100 AS hm
                  FROM assign))
          SELECT CAST(cur.t AS BIGINT) AS tranche,
                 CAST(count(*) AS BIGINT) AS docs_prev,
                 CAST(count(*) FILTER (WHERE cur.comp != prev.comp) AS BIGINT)
                   AS comp_changed,
                 CAST(count(*) FILTER (WHERE cur.split != prev.split) AS BIGINT)
                   AS split_changed
          FROM sbands cur JOIN sbands prev
            ON prev.t = cur.t - 1 AND prev.doc_id = cur.doc_id
          GROUP BY 1""",
    "dedup_components" ->
      s"""WITH RECURSIVE $ShingleCte,
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          bands AS (
            SELECT doc_id, b, md5(array_to_string(mhs[4*b+1:4*b+4], '|')) AS bsig
            FROM sig, range(4) t(b)),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                    UNION ALL
                    SELECT doc_b AS src, doc_a AS dst FROM cand),
          verts AS (SELECT DISTINCT src AS v FROM edges),
          reach(v, r) AS (
            SELECT v, v FROM verts
            UNION
            SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.r)
          SELECT v AS doc_id, min(r) AS component, v = min(r) AS is_keeper
          FROM reach GROUP BY v""",
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes
          SELECT sz AS cluster_size, count(*) AS n_clusters,
                 CAST(sum(sz) AS BIGINT) AS n_docs
          FROM sizes GROUP BY sz""",
    // the full fixpoint IS the warm-start contract: same components,
    // same min-id labels
    "dedup_components_warm" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes
          SELECT v, comp FROM comps""",
    "dedup_quality_calibration" -> {
      val stopList = graft.functions.TextAnalysis.markerList(
        graft.functions.TextAnalysis.Stopwords)
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes,
          q AS (
            SELECT doc_id,
                   least(1.0, CAST(len(ws) AS DOUBLE) / 256.0)
                   * (1.0 - CAST(len(list_filter(ws, w -> w IN ($stopList)))
                             AS DOUBLE) / len(ws)) AS quality_score
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
          tagged AS (
            SELECT least(9, CAST(floor(q.quality_score * 10) AS BIGINT)) AS q_bucket,
                   CASE WHEN c.v IS NULL THEN 0 ELSE 1 END AS d
            FROM q LEFT JOIN comps c ON q.doc_id = c.v)
          SELECT q_bucket, count(*) AS n_docs,
                 CAST(sum(d) AS BIGINT) AS n_dup_members,
                 CAST(sum(d) * 1000 // count(*) AS BIGINT) AS dup_pm
          FROM tagged GROUP BY 1"""
    },
    "dedup_lsh_sweep" ->
      s"""WITH $ShingleCte,
          mh AS (
            SELECT doc_id, i, min(md5(i::VARCHAR || '|' || shingle)) AS mh
            FROM ex, range(16) t(i) GROUP BY doc_id, i),
          sig AS (SELECT doc_id, list(mh ORDER BY i) AS mhs FROM mh GROUP BY doc_id),
          cfg AS (SELECT unnest([2, 4, 8]) AS nb),
          bandsall AS (
            SELECT cfg.nb, s.doc_id, t.b,
                   md5(array_to_string(
                     s.mhs[(16 // cfg.nb) * t.b + 1
                           : (16 // cfg.nb) * t.b + (16 // cfg.nb)], '|')) AS bsig
            FROM sig s, cfg, range(8) t(b) WHERE t.b < cfg.nb),
          occ AS (
            SELECT nb, b, bsig, count(*) AS occ
            FROM bandsall GROUP BY 1, 2, 3),
          cappedcnt AS (
            SELECT cfg.nb,
                   (SELECT count(*) FROM occ o
                    WHERE o.nb = cfg.nb AND o.occ > $SweepBucketCap)
                     AS n_capped_buckets
            FROM cfg),
          kept AS (
            SELECT ba.* FROM bandsall ba
            JOIN occ o ON ba.nb = o.nb AND ba.b = o.b AND ba.bsig = o.bsig
            WHERE o.occ <= $SweepBucketCap),
          cand AS (
            SELECT DISTINCT a.nb, a.doc_id AS doc_a, b2.doc_id AS doc_b
            FROM kept a JOIN kept b2
              ON a.nb = b2.nb AND a.b = b2.b AND a.bsig = b2.bsig
             AND a.doc_id < b2.doc_id),
          conf AS (
            SELECT c.nb,
                   len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) * 5 >= 64
                     AS confirmed
            FROM cand c JOIN sig x ON c.doc_a = x.doc_id
            JOIN sig y ON c.doc_b = y.doc_id),
          agg AS (
            SELECT nb, count(*) AS n_candidates,
                   sum(CASE WHEN confirmed THEN 1 ELSE 0 END) AS n_confirmed
            FROM conf GROUP BY 1)
          SELECT CAST(cfg.nb AS BIGINT) AS n_bands,
                 CAST(16 // cfg.nb AS BIGINT) AS rows_per_band,
                 CAST(coalesce(agg.n_candidates, 0) AS BIGINT) AS n_candidates,
                 CAST(coalesce(agg.n_confirmed, 0) AS BIGINT) AS n_confirmed,
                 CAST(CASE WHEN coalesce(agg.n_candidates, 0) = 0 THEN 0
                      ELSE agg.n_confirmed * 1000 // agg.n_candidates END AS BIGINT)
                   AS precision_pm,
                 CAST(cc.n_capped_buckets AS BIGINT) AS n_capped_buckets
          FROM cfg
          LEFT JOIN agg ON cfg.nb = agg.nb
          JOIN cappedcnt cc ON cc.nb = cfg.nb""",
    "dedup_graph_rank" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes,
          deg AS (SELECT src AS v, count(*) AS dg FROM edges GROUP BY 1),
          r0 AS (SELECT v, 1000000 AS r FROM deg),
          r1 AS (SELECT e.dst AS v,
                        150000 + (85 * sum(r0.r // d.dg)) // 100 AS r
                 FROM edges e JOIN deg d ON e.src = d.v
                 JOIN r0 ON r0.v = e.src GROUP BY e.dst),
          r2 AS (SELECT e.dst AS v,
                        150000 + (85 * sum(r1.r // d.dg)) // 100 AS r
                 FROM edges e JOIN deg d ON e.src = d.v
                 JOIN r1 ON r1.v = e.src GROUP BY e.dst),
          r3 AS (SELECT e.dst AS v,
                        150000 + (85 * sum(r2.r // d.dg)) // 100 AS r
                 FROM edges e JOIN deg d ON e.src = d.v
                 JOIN r2 ON r2.v = e.src GROUP BY e.dst)
          SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_e6 FROM r3""",
    "sample_dedup_weight" ->
      s"""WITH RECURSIVE $ShingleCte, $Comp08Ctes
          SELECT d.doc_id,
                 CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size,
                 CAST(1000 // coalesce(s.sz, 1) AS BIGINT) AS weight_pm
          FROM documents d
          LEFT JOIN comps c ON d.doc_id = c.v
          LEFT JOIN sizes s ON c.comp = s.comp""",
    "dedup_simhash" ->
      """WITH wc AS (
           SELECT doc_id, word, count(*) AS cnt,
                  ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
           GROUP BY doc_id, word, md5(word)),
         votes AS (
           SELECT doc_id, j,
                  sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS vote
           FROM wc, range(60) t(j) GROUP BY doc_id, j)
         SELECT doc_id,
                CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
         FROM votes GROUP BY doc_id""",
    "dedup_simhash_pairs" ->
      """WITH wc AS (
           SELECT doc_id, word, count(*) AS cnt,
                  ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
           GROUP BY doc_id, word, md5(word)),
         votes AS (
           SELECT doc_id, j,
                  sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS vote
           FROM wc, range(60) t(j) GROUP BY doc_id, j),
         sig AS (
           SELECT doc_id,
                  sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
           FROM votes GROUP BY doc_id),
         chunks AS (
           SELECT doc_id, c, (simhash >> (15 * c)) & 32767 AS chunk, simhash
           FROM sig, range(4) t(c))
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM chunks a JOIN chunks b
           ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 8""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> exact _,
    "dedup_allpairs_exact" -> allPairsExact _,
    "dedup_allpairs_incremental" -> allPairsIncremental _,
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccard(s, d)),
    "decontaminate" -> decontaminate _,
    "decontaminate_bloom" -> decontaminateBloom _,
    "dedup_spans" -> spanDedup _,
    "dedup_containment" -> ((s: SparkSession, d: String) => containmentPairs(s, d)),
    "dedup_spans_clean" -> spanDedupClean _,
    "dedup_editdist" -> editDistConfirm _,
    "dedup_minhash_lsh" -> minhashLsh _,
    "dedup_incremental" -> incrementalDedup _,
    "dedup_components" -> components _,
    "dedup_cluster_stats" -> clusterStats _,
    "dedup_components_warm" -> componentsWarmStart _,
    "sample_dedup_weight" -> softDedupWeights _,
    "dedup_graph_rank" -> graphRank _,
    "dedup_lsh_sweep" -> lshSweep _,
    "dedup_recall_eval" -> recallEval _,
    "dedup_quality_calibration" -> qualityCalibration _,
    "dedup_simhash" -> simhash _,
    "dedup_simhash_pairs" -> simhashPairs _,
    "dedup_winnow_pairs" -> winnowPairs _,
    "dedup_source_overlap" -> sourceOverlap _,
    "split_leakage" -> splitLeakage _,
    "split_by_component" -> splitByComponent _,
    "split_assignment_churn" -> splitAssignmentChurn _,
  )
}
