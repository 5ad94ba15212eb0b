package graft.functions

/** Shared DuckDB-oracle SQL fragments, hoisted into a dependency-FREE
  * object: operator objects interpolate these while constructing their
  * static `oracleSql` maps, so a fragment living in one operator object
  * and used by another creates a class-initialization edge — and two
  * such edges in opposite directions deadlock the JVM when concurrent
  * builders first-touch the two objects simultaneously (observed:
  * `TextAnalysis.<clinit>` ↔ `Dedup.<clinit>` wedged Bench's index
  * wave). Fragments here have no references to any graft object, so
  * every edge points INTO this object and no cycle can form.
  */
object SqlFragments {

  /** Per-doc distinct word-5-gram shingles over `documents` — must
    * stay in lockstep with the ShingleHashes kernel (n = 5, distinct
    * within doc).
    */
  val ShingleCte: String =
    """sh AS (
         SELECT doc_id,
                list_distinct(CASE WHEN len(ws) >= 5
                  THEN [array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]
                  ELSE [] END) AS s
         FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)),
       ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh)"""

  /** Register fold for the shared 256-register, 53-bit-rank HLL
    * discipline: collapse register rows (keys…, j, m) of relation
    * `src` into one (keys…, s_scaled, v_zero) row per key group, where
    * s_scaled = Σ 2^(53−m) over present registers plus 2^53 per absent
    * register (the harmonic-sum denominator scaled to an exact
    * integer) and v_zero counts absent registers.
    */
  def hllRegisterFoldSql(src: String, keys: Seq[String]): String = {
    val sel = if (keys.isEmpty) "" else keys.mkString(", ") + ","
    val grp = if (keys.isEmpty) "" else "GROUP BY " + keys.mkString(", ")
    s"""(SELECT $sel
           CAST(sum(CAST(1 AS BIGINT) << (53 - m))
                + (256 - count(*)) * (CAST(1 AS BIGINT) << 53)
             AS BIGINT) AS s_scaled,
           CAST(256 - count(*) AS BIGINT) AS v_zero
         FROM $src $grp)"""
  }

  /** The αm²·2⁵³/S estimator with the small-range linear-counting
    * switch (Flajolet et al., AofA 2007) over a (keys…, s_scaled,
    * v_zero) relation `src` — THE register→estimate float discipline
    * both engines share; hoisted here so its four oracle consumers
    * (stats_hll_ngrams, stats_hll_overlap's per-source and union
    * estimates, events_hll_cube) cannot drift apart.
    */
  def hllEstSql(src: String, keys: Seq[String], alias: String = "est_hll"): String = {
    val sel = if (keys.isEmpty) "" else keys.mkString(", ") + ","
    s"""(SELECT $sel
           CASE WHEN v_zero > 0 AND est_raw <= 640 THEN est_lc
                ELSE est_raw END AS $alias
         FROM (SELECT $sel v_zero,
                 CAST(round((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                   * 9007199254740992.0 / CAST(s_scaled AS DOUBLE), 0)
                   AS BIGINT) AS est_raw,
                 CASE WHEN v_zero > 0 THEN
                   CAST(round(256.0 * round(ln(256.0 / CAST(v_zero AS DOUBLE)), 9), 0)
                     AS BIGINT) END AS est_lc
               FROM $src))"""
  }
  /** Shared oracle fragment: MinHash-LSH candidate pairs CONFIRMED at
    * est-Jaccard ≥ 0.8 (`candf`), without component resolution —
    * factored from [[Comp08Ctes]] for oracles that need the confirmed
    * pair set under a different fixpoint (the per-tranche reach of
    * `split_assignment_churn`). Requires [[ShingleCte]] ahead of it.
    */
  val Lsh08PairCtes =
    """mh AS (
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
       candk AS (
         SELECT doc_a, doc_b,
                len(list_filter(range(16), i -> x.mhs[i+1] = y.mhs[i+1])) AS k
         FROM cand
         JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id),
       candf AS (
         SELECT doc_a, doc_b FROM candk
         WHERE CAST(k AS DOUBLE) / 16 >= 0.8)"""

  /** Shared oracle fragment: MinHash-LSH candidates confirmed at
    * est-Jaccard ≥ 0.8, resolved to connected components with their
    * sizes — the SQL mirror of [[dupComponents]](0.8). Requires
    * [[ShingleCte]] ahead of it under WITH RECURSIVE.
    */
  val Comp08Ctes =
    s"""$Lsh08PairCtes,
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM candf
                 UNION ALL
                 SELECT doc_b AS src, doc_a AS dst FROM candf),
       verts AS (SELECT DISTINCT src AS v FROM edges),
       reach(v, r) AS (
         SELECT v, v FROM verts
         UNION
         SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.r),
       comps AS (SELECT v, min(r) AS comp FROM reach GROUP BY v),
       sizes AS (SELECT comp, count(*) AS sz FROM comps GROUP BY comp)"""

}
