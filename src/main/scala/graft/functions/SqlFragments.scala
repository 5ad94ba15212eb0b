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
}
